"""Pyramidal Lucas-Kanade optical flow.

Replaces `cv::calcOpticalFlowPyrLK` as used by the reference's
`FlowEstimator` (`flow_estimator.cpp:84-103`: 3 pyramid levels, 21x21
window, 30 iterations / eps 0.01 criteria) to bootstrap new patches' flow
direction and initial warp between the last two frames
(`flow_estimator.cpp:27-82`).

TPU-shaped: all corners are tracked simultaneously — per-corner windows are
gathered with bilinear sampling, the 2x2 normal equations are closed-form,
and the iterate-translate loop is a fixed-trip `lax.fori_loop` under `vmap`
over corners. Status mirrors OpenCV: a track fails if its window leaves the
image or the spatial-gradient matrix is degenerate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from evo_tpu.kernels import interp
from evo_tpu.kernels.gradients import image_pyramid


def _window_offsets(radius: int, dtype=jnp.float32):
    r = jnp.arange(-radius, radius + 1, dtype=dtype)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    return ox.ravel(), oy.ravel()  # [(2r+1)^2]


def _track_level(img0, img1, pt0, guess, radius: int, num_iters: int):
    """Track one corner at one pyramid level. pt0 [2] (x, y) in this level's
    coords; guess [2] initial displacement. Returns (flow [2], ok)."""
    ox, oy = _window_offsets(radius, img0.dtype)
    x0 = pt0[0] + ox
    y0 = pt0[1] + oy
    t = interp.bilinear(img0, y0, x0)  # template window
    # spatial gradients of the template (central differences via sampling)
    gx = 0.5 * (interp.bilinear(img0, y0, x0 + 1.0) - interp.bilinear(img0, y0, x0 - 1.0))
    gy = 0.5 * (interp.bilinear(img0, y0 + 1.0, x0) - interp.bilinear(img0, y0 - 1.0, x0))
    a11 = jnp.sum(gx * gx)
    a12 = jnp.sum(gx * gy)
    a22 = jnp.sum(gy * gy)
    det = a11 * a22 - a12 * a12
    ok_grad = det > 1e-7
    det_safe = jnp.where(ok_grad, det, 1.0)

    def body(_, v):
        cur = interp.bilinear(img1, y0 + v[1], x0 + v[0])
        e = cur - t
        b1 = jnp.sum(e * gx)
        b2 = jnp.sum(e * gy)
        dvx = -(a22 * b1 - a12 * b2) / det_safe
        dvy = -(-a12 * b1 + a11 * b2) / det_safe
        return v + jnp.array([dvx, dvy], v.dtype)

    v = jax.lax.fori_loop(0, num_iters, body, guess.astype(img0.dtype))
    # window overhang at coarse levels is fine (border-replicate sampling,
    # like OpenCV); the final in-image check happens at level 0 only
    return v, ok_grad & jnp.all(jnp.isfinite(v))


@partial(jax.jit, static_argnames=("num_levels", "radius", "num_iters"))
def pyramidal_lk(
    img0,
    img1,
    pts,
    valid,
    *,
    num_levels: int = 3,
    radius: int = 10,
    num_iters: int = 30,
):
    """Track points pts [N, 2] (x, y) from img0 to img1.

    Returns (new_pts [N, 2], flow [N, 2], status [N] bool). radius=10 gives
    the reference's 21x21 window (flow_estimator.h:14).
    """
    pyr0 = image_pyramid(img0, num_levels)
    pyr1 = image_pyramid(img1, num_levels)

    n = pts.shape[0]
    flow = jnp.zeros((n, 2), img0.dtype)
    status = valid
    for lvl in range(num_levels - 1, -1, -1):
        scale = 2.0**lvl
        p_lvl = pts / scale
        track = jax.vmap(
            lambda p, g: _track_level(pyr0[lvl], pyr1[lvl], p, g, radius, num_iters)
        )
        v, ok = track(p_lvl, flow / scale)
        flow = v * scale
        status = status & ok
    new_pts = pts + flow
    # final landing position must stay inside the full-resolution image
    h, w = img1.shape
    in_img = (
        (new_pts[:, 0] >= 1) & (new_pts[:, 0] < w - 1)
        & (new_pts[:, 1] >= 1) & (new_pts[:, 1] < h - 1)
    )
    return new_pts, flow, status & in_img
