"""Harris corner detection with NMS, quality filtering and min-distance
selection.

Replaces `cv::goodFeaturesToTrack(..., useHarris=true)` as called by the
reference detector (`feature_detector.cpp:568-583`: maxCorners=100,
qualityLevel=0.01, minDistance=10, blockSize=3, k=0.04, plus a border mask
excluding `patchExtent+1`-wide margins, `feature_detector.cpp:38-43`).

TPU-shaped: the response map is convolutions + elementwise math; NMS is a
max-pool comparison; min-distance selection is a fixed-trip greedy loop over
the top-K responses (K static) using a suppression mask — all jit-able, no
data-dependent shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from evo_tpu.kernels.gradients import SOBEL_X, SOBEL_Y, _conv2same


def harris_response(img, block_size: int = 3, k: float = 0.04, sobel_scale: float = 0.25):
    """Harris corner response R = det(M) − k·tr(M)² with a box-summed
    structure tensor M over `block_size`, like OpenCV's cornerHarris."""
    gx = _conv2same(img, SOBEL_X) * sobel_scale
    gy = _conv2same(img, SOBEL_Y) * sobel_scale
    box = jnp.ones((block_size, block_size), img.dtype)
    ixx = _conv2same(gx * gx, box)
    iyy = _conv2same(gy * gy, box)
    ixy = _conv2same(gx * gy, box)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    return det - k * tr * tr


def _maxpool_same(x, size: int):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (size, size), (1, 1), "SAME"
    )


@partial(
    jax.jit,
    static_argnames=("max_corners", "block_size", "nms_size", "border"),
)
def detect_corners(
    img,
    *,
    max_corners: int = 100,
    quality_level: float = 0.01,
    min_distance: float = 10.0,
    block_size: int = 3,
    k: float = 0.04,
    nms_size: int = 3,
    border: int = 13,
):
    """goodFeaturesToTrack-equivalent corner selection.

    Returns (xy [max_corners, 2] float, score [max_corners], valid
    [max_corners] bool). Selection: Harris response, 3x3 NMS, drop responses
    below quality_level * max, drop borders (reference mask is
    patchExtent+1 = 13 px, feature_detector.cpp:38-43), then greedily accept
    the strongest corners while suppressing a min_distance disc around each
    accepted one (OpenCV's greedy min-distance pass).
    """
    h, w = img.shape
    resp = harris_response(img, block_size, k)
    is_peak = resp >= _maxpool_same(resp, nms_size)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_border = (
        (xs >= border) & (xs < w - border) & (ys >= border) & (ys < h - border)
    )
    # quality threshold relative to the max over the *masked* region (like
    # OpenCV); the raw max sits on conv border artifacts otherwise
    qmax = jnp.max(jnp.where(in_border, resp, -jnp.inf))
    good = is_peak & in_border & (resp > quality_level * qmax) & (resp > 0)
    scores = jnp.where(good, resp, -jnp.inf).ravel()

    # top-K candidates (K = generous pool for the greedy distance pass)
    K = min(4 * max_corners, h * w)
    top_scores, top_idx = jax.lax.top_k(scores, K)
    top_y = (top_idx // w).astype(jnp.float32)
    top_x = (top_idx % w).astype(jnp.float32)
    top_ok = jnp.isfinite(top_scores)

    min_d2 = jnp.asarray(min_distance * min_distance, img.dtype)

    # Greedy min-distance acceptance as a FIXPOINT instead of a K-step
    # serial scan (K sequential tiny loop iterations cost tens of ms on
    # TPU). accept[i] = ok[i] & no accepted higher-ranked candidate within
    # min_distance — a well-founded recursion over the rank order with a
    # unique fixpoint (= the greedy result), reached by iterating the
    # whole-vector update until it stops changing: entries whose longest
    # suppression chain has depth d stabilize after d sweeps (typically
    # 3-6), and an unchanged sweep certifies the fixpoint. Each sweep is
    # one [K, K] masked any-reduce — vector work, no serial dependence.
    pos = jnp.stack([top_x, top_y], axis=-1)  # [K, 2] in rank order
    d2 = jnp.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    rank = jnp.arange(K)
    conflict = (
        (rank[None, :] < rank[:, None]) & (d2 < min_d2) & top_ok[None, :]
    )  # [K, K]: candidate j (higher-ranked) can suppress i

    def sweep(a):
        return top_ok & ~jnp.any(conflict & a[None, :], axis=1)

    def w_cond(state):
        a, prev = state
        return jnp.any(a != prev)

    def w_body(state):
        a, _ = state
        return sweep(a), a

    accepted, _ = jax.lax.while_loop(
        w_cond, w_body, (sweep(top_ok), top_ok)
    )
    # cap at max_corners strongest survivors, compacted in rank order
    acc_rank = jnp.cumsum(accepted.astype(jnp.int32))  # 1-based among accepted
    sel = accepted & (acc_rank <= max_corners)
    slot = jnp.where(sel, acc_rank - 1, max_corners)  # drop overflow
    xy = (
        jnp.zeros((max_corners + 1, 2), img.dtype)
        .at[slot].set(pos, mode="drop")[:max_corners]
    )
    valid = (
        jnp.zeros(max_corners + 1, bool)
        .at[slot].set(sel, mode="drop")[:max_corners]
    )
    score_out = harris_response(img, block_size, k)
    sel_scores = jnp.where(
        valid,
        score_out[xy[:, 1].astype(jnp.int32), xy[:, 0].astype(jnp.int32)],
        0.0,
    )
    return xy, sel_scores, valid
