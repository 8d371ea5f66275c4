"""Image sampling: bilinear and bicubic (Catmull-Rom) interpolation.

Replaces Ceres' `BiCubicInterpolator` over `Grid2D`
(`implementation/feature_tracker/include/feature_tracker/optimizer_cost.h:10-13`,
grid fill at `src/optimizer.cpp:15-30`): the tracker samples keyframe
gradient images at warped (non-integer) positions inside the alignment
residual, and needs smooth derivatives w.r.t. the sample position for the
solver. Both samplers here are plain gather + arithmetic — fully
differentiable via JAX autodiff (no hand-written derivative like Ceres'),
batched over arbitrary leading dims, and fused by XLA into the surrounding
residual computation.

Out-of-bounds behavior: coordinates are clamped to the valid support
(matching Ceres' Grid2D edge clamping).
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather2d(img, yi, xi):
    """img [..., H, W] gathered at integer yi/xi [...] (clamped)."""
    h, w = img.shape[-2], img.shape[-1]
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    return img[..., yi, xi]


def bilinear(img, y, x):
    """Sample img [H, W] at float positions (y [..., ], x [..., ])."""
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    v00 = _gather2d(img, y0i, x0i)
    v01 = _gather2d(img, y0i, x0i + 1)
    v10 = _gather2d(img, y0i + 1, x0i)
    v11 = _gather2d(img, y0i + 1, x0i + 1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _catmull_rom_w(f):
    """Standard Catmull-Rom weights for taps at integer offsets (-1, 0, 1, 2)."""
    f2 = f * f
    f3 = f2 * f
    wm1 = 0.5 * (-f3 + 2.0 * f2 - f)
    w0 = 0.5 * (3.0 * f3 - 5.0 * f2 + 2.0)
    w1 = 0.5 * (-3.0 * f3 + 4.0 * f2 + f)
    w2 = 0.5 * (f3 - f2)
    return wm1, w0, w1, w2


def bicubic(img, y, x):
    """Catmull-Rom bicubic sampling of img [H, W] at (y, x) [..., ]."""
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    wy = _catmull_rom_w(fy)
    wx = _catmull_rom_w(fx)
    acc = 0.0
    for dy in range(-1, 3):
        row = 0.0
        for dx in range(-1, 3):
            row = row + wx[dx + 1] * _gather2d(img, y0i + dy, x0i + dx)
        acc = acc + wy[dy + 1] * row
    return acc


def cubic_taps(coord, size: int):
    """Dense Catmull-Rom tap matrix [N, size]: weight of every integer grid
    line in [0, size) for each sample coordinate.

    This is the MXU formulation of bicubic sampling (same trick as the
    separable splat in kernels.splat): instead of 16 random gathers per
    sample — which XLA lowers to serial per-element gathers on TPU — the
    sample becomes two dense tap-matrix contractions,

        value[n] = Σ_i Σ_j  ty[n, i] · img[i, j] · tx[n, j],

    with ty/tx mostly zero (support radius 2). Intended for *local windows*
    (size ≈ 64), where the dense contraction is a few MFLOPs of MXU work.
    Weights match `bicubic` exactly for interior points; coordinates whose
    4-tap support extends past [0, size) lose the outside taps (callers mask
    out-of-bounds samples anyway, matching the residual's OOB zeroing).
    """
    from jax import lax

    grid = lax.broadcasted_iota(coord.dtype, (1, size), 1)
    d = jnp.abs(coord[:, None] - grid)  # [N, size]
    # Catmull-Rom kernel (a = -1/2): matches _catmull_rom_w tap-for-tap.
    near = ((1.5 * d - 2.5) * d) * d + 1.0  # |d| <= 1
    far = ((-0.5 * d + 2.5) * d - 4.0) * d + 2.0  # 1 < |d| < 2
    return jnp.where(d <= 1.0, near, jnp.where(d < 2.0, far, 0.0))


def linear_taps(coord, size: int):
    """Dense bilinear tap matrix [N, size] (support radius 1) — 3x cheaper
    to build than `cubic_taps` (one hat function vs two cubic branches).
    For samplers whose consumer only needs ~px accuracy (e.g. the event
    budget's gradient-L1 heuristic), matching OpenCV's bilinear access."""
    from jax import lax

    grid = lax.broadcasted_iota(coord.dtype, (1, size), 1)
    d = jnp.abs(coord[:, None] - grid)
    return jnp.maximum(0.0, 1.0 - d)


def cubic_taps_vd(coord, size: int):
    """(cubic_taps, cubic_taps_d) fused: shares d / |d| / sign and the
    Horner powers between the value and derivative polynomials — the tap
    build is VPU-bound and dominates the alignment linearize, so the shared
    subexpressions are a real ~30% cut vs two separate builds."""
    from jax import lax

    grid = lax.broadcasted_iota(coord.dtype, (1, size), 1)
    d = coord[:, None] - grid
    ad = jnp.abs(d)
    sgn = jnp.sign(d)
    is_near = ad <= 1.0
    is_far = ad < 2.0
    near_v = ((1.5 * ad - 2.5) * ad) * ad + 1.0
    far_v = ((-0.5 * ad + 2.5) * ad - 4.0) * ad + 2.0
    v = jnp.where(is_near, near_v, jnp.where(is_far, far_v, 0.0))
    near_d = (4.5 * ad - 5.0) * ad
    far_d = (-1.5 * ad + 5.0) * ad - 4.0
    dv = sgn * jnp.where(is_near, near_d, jnp.where(is_far, far_d, 0.0))
    return v, dv


def cubic_taps_d(coord, size: int):
    """d/dcoord of `cubic_taps` — derivative tap matrix [N, size]. Sampling
    with these taps yields the spatial derivative of the interpolant, which
    is what an analytic Jacobian of a sampling residual needs (one extra
    matmul instead of a forward-mode pass through the sampling matmuls)."""
    from jax import lax

    grid = lax.broadcasted_iota(coord.dtype, (1, size), 1)
    d = coord[:, None] - grid
    ad = jnp.abs(d)
    sgn = jnp.sign(d)
    near = (4.5 * ad - 5.0) * ad  # d/d|d| of the |d| <= 1 branch
    far = (-1.5 * ad + 5.0) * ad - 4.0  # 1 < |d| < 2 branch
    return sgn * jnp.where(ad <= 1.0, near, jnp.where(ad < 2.0, far, 0.0))


def bicubic_mxu(img, y, x):
    """Catmull-Rom bicubic sampling via dense tap-matrix contractions
    (MXU path). img [H, W] or [H, W, C]; y, x [N]. Returns [N] or [N, C].

    Cost is O(N·H·W) dense FLOPs — use on local windows (H, W ≲ 64), where
    it is orders of magnitude faster on TPU than the gather-based `bicubic`.
    """
    h, w = img.shape[0], img.shape[1]
    ty = cubic_taps(y, h)  # [N, H]
    tx = cubic_taps(x, w)  # [N, W]
    if img.ndim == 2:
        tmp = jnp.einsum("nh,hw->nw", ty, img, preferred_element_type=jnp.float32)
        return jnp.einsum("nw,nw->n", tx, tmp, preferred_element_type=jnp.float32)
    tmp = jnp.einsum("nh,hwc->nwc", ty, img, preferred_element_type=jnp.float32)
    return jnp.einsum("nw,nwc->nc", tx, tmp, preferred_element_type=jnp.float32)


def sample(img, y, x, mode: str = "bilinear"):
    if mode == "bilinear":
        return bilinear(img, y, x)
    if mode == "bicubic":
        return bicubic(img, y, x)
    raise ValueError(mode)
