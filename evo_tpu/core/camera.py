"""Differentiable pinhole camera with radial-tangential distortion.

TPU-native counterpart of the reference's templated `CameraModel<Scalar>`
(`common/include/common/camera_model.h:26-127`): `project` applies pinhole +
radtan (k1, k2, p1, p2[, k3]) distortion; `unproject` undoes distortion with
a fixed-point iteration (10 iterations, `camera_model.h:97-106`) and returns a
unit-norm bearing vector. Where the reference relies on Ceres Jets for
autodiff through the camera, here plain `jax.grad`/`jacfwd` differentiates
through everything, including the fixed-point loop (unrolled via lax.scan,
static trip count).

All functions broadcast over leading batch dimensions.
Intrinsics layout: [fx, fy, cx, cy, k1, k2, p1, p2, k3] (the 9 scalars of
`calib.txt`, `davis240c_reader.cpp:18-58`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_UNDISTORT_ITERS = 10  # matches camera_model.h:97-106


def _distort(params, xy):
    """Apply radtan distortion to normalized coords xy [..., 2]."""
    k1, k2, p1, p2, k3 = (params[..., 4], params[..., 5], params[..., 6],
                          params[..., 7], params[..., 8])
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def project(params, p3d):
    """3D camera-frame points [..., 3] → pixel coords [..., 2].

    Mirrors `CameraModel::project` (`camera_model.h:49-77`).
    """
    z = p3d[..., 2:3]
    xy = p3d[..., 0:2] / z
    xyd = _distort(params, xy)
    f = jnp.stack([params[..., 0], params[..., 1]], axis=-1)
    c = jnp.stack([params[..., 2], params[..., 3]], axis=-1)
    return f * xyd + c


def undistort(params, xy_dist):
    """Invert radtan distortion by fixed-point iteration (camera_model.h:97-106)."""

    def step(xy, _):
        xyd = _distort(params, xy)
        return xy - (xyd - xy_dist), None

    xy0 = xy_dist
    xy, _ = jax.lax.scan(step, xy0, None, length=N_UNDISTORT_ITERS)
    return xy


def unproject(params, pix):
    """Pixel coords [..., 2] → unit-norm bearing vectors [..., 3].

    Mirrors `CameraModel::unproject` (`camera_model.h:80-115`).
    """
    f = jnp.stack([params[..., 0], params[..., 1]], axis=-1)
    c = jnp.stack([params[..., 2], params[..., 3]], axis=-1)
    xy_dist = (pix - c) / f
    xy = undistort(params, xy_dist)
    bearing = jnp.concatenate([xy, jnp.ones_like(xy[..., 0:1])], axis=-1)
    return bearing / jnp.linalg.norm(bearing, axis=-1, keepdims=True)


def in_bounds(params_or_wh, pix, margin: float = 0.0):
    """Validity mask for pixel coords against the sensor rectangle."""
    if hasattr(params_or_wh, "width"):
        w, h = params_or_wh.width, params_or_wh.height
    else:
        w, h = params_or_wh
    x, y = pix[..., 0], pix[..., 1]
    return (x >= margin) & (x <= w - 1 - margin) & (y >= margin) & (y <= h - 1 - margin)
