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


def sample(img, y, x, mode: str = "bilinear"):
    if mode == "bilinear":
        return bilinear(img, y, x)
    if mode == "bicubic":
        return bicubic(img, y, x)
    raise ValueError(mode)
