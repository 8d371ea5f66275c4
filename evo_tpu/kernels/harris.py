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

    def body(carry, i):
        taken_xy, taken_valid, n_taken = carry
        cx, cy = top_x[i], top_y[i]
        d2 = jnp.sum((taken_xy - jnp.array([cx, cy])) ** 2, axis=-1)
        clash = jnp.any(taken_valid & (d2 < min_d2))
        accept = top_ok[i] & ~clash & (n_taken < max_corners)
        slot = jnp.clip(n_taken, 0, max_corners - 1)
        taken_xy = jnp.where(
            accept,
            taken_xy.at[slot].set(jnp.array([cx, cy])),
            taken_xy,
        )
        taken_valid = jnp.where(accept, taken_valid.at[slot].set(True), taken_valid)
        return (taken_xy, taken_valid, n_taken + accept.astype(jnp.int32)), accept

    init = (
        jnp.zeros((max_corners, 2), img.dtype),
        jnp.zeros(max_corners, bool),
        jnp.asarray(0, jnp.int32),
    )
    (xy, valid, _), _ = jax.lax.scan(body, init, jnp.arange(K))
    score_out = harris_response(img, block_size, k)
    sel_scores = jnp.where(
        valid,
        score_out[xy[:, 1].astype(jnp.int32), xy[:, 0].astype(jnp.int32)],
        0.0,
    )
    return xy, sel_scores, valid
