"""Pyramidal Lucas-Kanade optical flow.

Replaces `cv::calcOpticalFlowPyrLK` as used by the reference's
`FlowEstimator` (`flow_estimator.cpp:84-103`: 3 pyramid levels, 21x21
window, 30 iterations / eps 0.01 criteria) to bootstrap new patches' flow
direction and initial warp between the last two frames
(`flow_estimator.cpp:27-82`).

TPU-shaped: all corners are tracked simultaneously — each corner's level
window comes from ONE `dynamic_slice` (a LK_WINDOW² local patch around the
corner), and every (re)sampling inside the iteration loop is a separable
Catmull-Rom tap-matrix contraction on that resident window: `t = T_y @ win
@ T_xᵀ` — MXU matmuls instead of the per-point gathers a naive bilinear
sampler lowers to (gathers serialize on TPU; the gather formulation measured
~200 ms per frame vs ~2 ms for this one). Same trick as the alignment
sampler (tracker.align._sample_grad_pair). The 2x2 normal equations are
closed-form and the iterate-translate loop is a fixed-trip `lax.fori_loop`
under `vmap` over corners. Status mirrors OpenCV: a track fails if its
window leaves the image or the spatial-gradient matrix is degenerate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from evo_tpu.kernels import interp
from evo_tpu.kernels.gradients import image_pyramid

# local-window side for the slice+taps sampler: covers the 21x21 LK window
# plus per-level refinement travel (the coarse-level guess recenters the
# target window, so only the residual update needs slack), lane-friendly
LK_WINDOW = 64


def _track_level(img0, img1, pt0, guess, radius: int, num_iters: int):
    """Track one corner at one pyramid level. pt0 [2] (x, y) in this level's
    coords; guess [2] initial displacement. Returns (flow [2], ok)."""
    h, w = img0.shape
    # coarse pyramid levels can be smaller than LK_WINDOW — shrink the
    # slice to fit (shapes are static per level, so this is compile-time)
    W = min(LK_WINDOW, h, w)
    half = W // 2
    r = jnp.arange(-radius, radius + 1, dtype=img0.dtype)  # [S]

    # template window around pt0 (integer origin => zero-tangent slice)
    ox0 = jnp.clip(jnp.round(pt0[0]).astype(jnp.int32) - half, 0, w - W)
    oy0 = jnp.clip(jnp.round(pt0[1]).astype(jnp.int32) - half, 0, h - W)
    win0 = jax.lax.dynamic_slice(img0, (oy0, ox0), (W, W))
    x0 = pt0[0] - ox0.astype(img0.dtype) + r  # [S] window-local coords
    y0 = pt0[1] - oy0.astype(img0.dtype) + r
    tx = interp.cubic_taps(x0, W)  # [S, W]
    ty = interp.cubic_taps(y0, W)
    txd = interp.cubic_taps_d(x0, W)
    tyd = interp.cubic_taps_d(y0, W)
    yw = ty @ win0  # [S, W]
    t = yw @ tx.T  # [S, S] template
    gx = yw @ txd.T  # d/dx of the interpolant
    gy = (tyd @ win0) @ tx.T
    a11 = jnp.sum(gx * gx)
    a12 = jnp.sum(gx * gy)
    a22 = jnp.sum(gy * gy)
    det = a11 * a22 - a12 * a12
    ok_grad = det > 1e-7
    det_safe = jnp.where(ok_grad, det, 1.0)

    # target window centered at pt0 + guess: the iterate only travels the
    # per-level refinement (≤ a few px), so the slice slack of
    # (LK_WINDOW/2 − radius) px is ample; beyond it sampling clamps to the
    # window edge and the final in-image status check rejects the track
    ox1 = jnp.clip(jnp.round(pt0[0] + guess[0]).astype(jnp.int32) - half, 0, w - W)
    oy1 = jnp.clip(jnp.round(pt0[1] + guess[1]).astype(jnp.int32) - half, 0, h - W)
    win1 = jax.lax.dynamic_slice(img1, (oy1, ox1), (W, W))
    bx1 = pt0[0] - ox1.astype(img0.dtype) + r
    by1 = pt0[1] - oy1.astype(img0.dtype) + r

    eps2 = jnp.asarray(1e-4, img0.dtype)  # OpenCV criteria: eps 0.01 (²)

    def w_cond(state):
        _, d2, it = state
        return (it < num_iters) & (d2 >= eps2)

    def w_body(state):
        v, _, it = state
        txv = interp.cubic_taps(bx1 + v[0], W)
        tyv = interp.cubic_taps(by1 + v[1], W)
        cur = (tyv @ win1) @ txv.T  # [S, S]
        e = cur - t
        b1 = jnp.sum(e * gx)
        b2 = jnp.sum(e * gy)
        dvx = -(a22 * b1 - a12 * b2) / det_safe
        dvy = -(-a12 * b1 + a11 * b2) / det_safe
        dv = jnp.array([dvx, dvy], v.dtype)
        return v + dv, jnp.sum(dv * dv), it + 1

    # seed the carry from pt0 so its varying-manual-axes type matches the
    # body output when tracking shard-local corners inside shard_map (the
    # window slices depend on pt0, so the refined v is varying even when the
    # initial guess is a replicated zero). The refinement runs under the
    # reference's dual criteria (30 iters OR eps 0.01, flow_estimator.cpp:
    # 84-103) as a while_loop: under vmap, converged corners mask out and
    # the loop ends when the LAST corner converges — typically ~5-8 trips
    # instead of a fixed 30 (x3 levels) of serial small-matmul steps
    v0 = guess.astype(img0.dtype) + 0.0 * pt0.astype(img0.dtype)
    v, _, _ = jax.lax.while_loop(
        w_cond, w_body, (v0, jnp.asarray(jnp.inf, img0.dtype) + 0.0 * v0[0], 0 * ox1)
    )
    # travel guard: the target window is anchored at pt0 + guess, so an
    # iterate that moves more than (half − radius − 1) px beyond the guess
    # samples clamped window edges — it could "converge" on replicated
    # garbage while still landing inside the image (the pre-slice bilinear
    # version sampled the full image; this restores its failure semantics)
    slack = jnp.asarray(half - radius - 1, img0.dtype)
    ok_travel = jnp.all(jnp.abs(v - guess.astype(img0.dtype)) <= slack)
    return v, ok_grad & jnp.all(jnp.isfinite(v)) & ok_travel


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
