"""Geometric warps: SE(2)/affine inverse-map resampling.

Replaces the reference's `cv::warpAffine` uses (predicted-nabla rendering in
`patch.cpp:132-154`, gradient warping in `feature_detector.cpp:679-695`) with
inverse-map gather + interpolation: for every output pixel, apply the
*inverse* transform to find its source position and sample there. Fully
differentiable w.r.t. both the image and the warp parameters, so alignment
residuals get exact gradients through the warp (the role of Ceres Jets in
`optimizer_cost.h:29-90`).

Coordinate convention: patch-local coordinates with the patch center at
(0, 0); a patch of extent E covers [-E, E]^2 and has side S = 2E + 1 pixels
(reference default E = 12, S = 25; `feature_detector.h:15`).
"""

from __future__ import annotations

import jax.numpy as jnp

from evo_tpu.core import lie
from evo_tpu.kernels import interp


def patch_grid(extent: int, dtype=jnp.float32):
    """[(2E+1)^2, 2] patch-local (x, y) coordinates, center at origin."""
    side = 2 * extent + 1
    r = jnp.arange(side, dtype=dtype) - extent
    gx, gy = jnp.meshgrid(r, r)  # gx varies along columns
    return jnp.stack([gx.ravel(), gy.ravel()], axis=-1)


def warp_patch_se2(img, se2_params, center, extent: int, mode: str = "bilinear"):
    """Sample a (2E+1)^2 patch of `img` [H, W]: output pixel at patch-local
    p gets img(center + W(p)) where W is the SE(2) warp.

    This is the inverse-map formulation of `cv::warpAffine(..., WARP_INVERSE_MAP)`
    as used when rendering predicted gradients (patch.cpp:132-154): the stored
    warp maps *current-patch* coordinates to *keyframe-patch* coordinates.
    Returns the patch [(2E+1), (2E+1)].
    """
    g = patch_grid(extent, img.dtype)  # [(S²), 2]
    src = lie.se2_apply(se2_params, g) + center  # [(S²), 2] (x, y)
    side = 2 * extent + 1
    vals = interp.sample(img, src[:, 1], src[:, 0], mode)
    return vals.reshape(side, side)


def warp_points_se2(se2_params, pts):
    """Apply an SE(2) warp to points [..., 2] (x, y)."""
    return lie.se2_apply(se2_params, pts)


def resample_image(img, se2_params, out_h: int, out_w: int, mode: str = "bilinear"):
    """Whole-image SE(2) inverse-map resample: out(y, x) = img(W(x, y))."""
    xs = jnp.arange(out_w, dtype=img.dtype)
    ys = jnp.arange(out_h, dtype=img.dtype)
    gx, gy = jnp.meshgrid(xs, ys)
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)
    src = lie.se2_apply(se2_params, pts)
    vals = interp.sample(img, src[:, 1], src[:, 0], mode)
    return vals.reshape(out_h, out_w)
