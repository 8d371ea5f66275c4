"""Event splatting — the decode engine.

Turns a batch of DVS events into accumulated images. Replaces the
reference's per-event loops:
- plain signed integration (`Patch::integrateEvents`, `patch.cpp:65-85`;
  `FeatureDetector::integrateEvents`, `feature_detector.cpp:466-482`),
- 7x7 Gaussian splat (σ=1, radius 3) inside the contrast functor
  (`contrast_functor.h:66-99`).

TPU-native formulation
----------------------
Random scatter is TPU-hostile (SURVEY.md §7 hard part 1). But every splat
kernel used here (nearest / bilinear-tent / truncated Gaussian) is
*separable*: the 2D stamp of an event is an outer product of a 1D row-tap
vector and a 1D column-tap vector. So a whole batch splat is

    image[h, w] = Σ_e  Y[e, h] · X[e, w]   =   (Yᵀ @ X)[h, w]

with Y[e, h] = k(h − y_e)·sign_e and X[e, w] = k(w − x_e): one dense
[H, E] × [E, W] matmul per event chunk — MXU work at hundreds of events per
microsecond, no scatter at all. Tap matrices are built with broadcasted
iota + elementwise math (VPU), and everything is differentiable w.r.t. the
continuous event coordinates (needed by contrast maximization, which
optimizes warps through this splat). `lax.scan` over fixed-size chunks keeps
the tap matrices in VMEM-sized pieces and lets XLA pipeline them.

A scatter-based reference implementation is kept for testing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _taps(coord, size: int, mode: str, sigma: float, radius: int):
    """Tap matrix [E, size]: kernel weight of each integer grid line for each
    event coordinate. coord [E] float."""
    grid = lax.broadcasted_iota(coord.dtype, (1, size), 1)  # [1, size]
    d = grid - coord[:, None]  # [E, size]
    if mode == "nearest":
        return (jnp.abs(d) <= 0.5).astype(coord.dtype)
    if mode == "bilinear":
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))
    if mode == "gaussian":
        w = jnp.exp(-0.5 * (d / sigma) ** 2)
        return jnp.where(jnp.abs(d) <= radius, w, 0.0)
    raise ValueError(mode)


@partial(jax.jit, static_argnames=("height", "width", "mode", "sigma", "radius", "chunk"))
def splat_image(
    x,
    y,
    weight,
    height: int,
    width: int,
    *,
    mode: str = "bilinear",
    sigma: float = 1.0,
    radius: int = 3,
    chunk: int = 4096,
):
    """Accumulate events into an image [height, width].

    x, y : [N] float event coordinates (pixels).
    weight : [N] float per-event weight (polarity ±1; 0 masks padding out).
    mode : 'nearest' | 'bilinear' | 'gaussian' (σ, radius as in
        contrast_functor.h:66-99: σ=1, radius=3 → 7×7 stamp).

    Differentiable w.r.t. x, y, weight for 'bilinear' and 'gaussian'.
    """
    n = x.shape[0]
    dtype = jnp.result_type(x.dtype, jnp.float32)
    if n == 0:
        return jnp.zeros((height, width), dtype)
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros(pad, x.dtype)])
        y = jnp.concatenate([y, jnp.zeros(pad, y.dtype)])
        weight = jnp.concatenate([weight, jnp.zeros(pad, weight.dtype)])
    n_chunks = (n + pad) // chunk
    xs = x.reshape(n_chunks, chunk).astype(dtype)
    ys = y.reshape(n_chunks, chunk).astype(dtype)
    ws = weight.reshape(n_chunks, chunk).astype(dtype)

    def body(acc, inputs):
        cx, cy, cw = inputs
        ytap = _taps(cy, height, mode, sigma, radius) * cw[:, None]  # [E, H]
        xtap = _taps(cx, width, mode, sigma, radius)  # [E, W]
        acc = acc + jnp.dot(ytap.T, xtap, preferred_element_type=dtype)
        return acc, None

    # derive the init from the inputs so its varying-manual-axes type matches
    # the body output under shard_map (a plain zeros carry is "unvarying" and
    # scan rejects the mismatch)
    init = jnp.zeros((height, width), dtype) + (xs[0, 0] * 0).astype(dtype)
    out, _ = lax.scan(body, init, (xs, ys, ws))
    return out


def splat_image_scatter(x, y, weight, height: int, width: int, mode: str = "bilinear"):
    """Scatter-add reference implementation (testing / parity only)."""
    if mode == "nearest":
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        ok = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
        w = jnp.where(ok, weight, 0.0)
        xi = jnp.clip(xi, 0, width - 1)
        yi = jnp.clip(yi, 0, height - 1)
        img = jnp.zeros((height, width), weight.dtype)
        return img.at[yi, xi].add(w)
    if mode == "bilinear":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        img = jnp.zeros((height, width), weight.dtype)
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                xi = x0.astype(jnp.int32) + dx
                yi = y0.astype(jnp.int32) + dy
                ok = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
                w = jnp.where(ok, weight * wy * wx, 0.0)
                img = img.at[jnp.clip(yi, 0, height - 1), jnp.clip(xi, 0, width - 1)].add(w)
        return img
    raise ValueError(mode)


@partial(jax.jit, static_argnames=("height", "width", "mode", "sort"))
def splat_image_segment(x, y, weight, height: int, width: int, *,
                        mode: str = "bilinear", sort: bool = True):
    """Scatter-formulation decode: per-event pixel ids + `segment_sum`
    (optionally sorted so XLA sees monotonic segment ids) — the
    sort-by-pixel alternative SURVEY.md §7 hard part 1 calls for. Kept as a
    measured alternative to the separable-matmul splat: the matmul version
    does H·W MACs per event (~10^4x the useful taps) but rides the MXU; this
    one does exactly the useful taps but scatters. bench.py times both on
    real hardware; see BENCH `decode_variants`."""
    hw = height * width
    if mode == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, width - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, height - 1)
        ok = (
            (x >= -0.5) & (x <= width - 0.5) & (y >= -0.5) & (y <= height - 0.5)
        )
        pid = yi * width + xi
        w = jnp.where(ok, weight, 0.0)
        if sort:
            order = jnp.argsort(pid)
            pid, w = pid[order], w[order]
        flat = jax.ops.segment_sum(
            w, pid, num_segments=hw, indices_are_sorted=sort
        )
        return flat.reshape(height, width)
    if mode == "bilinear":
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - x0
        fy = y - y0
        pids = []
        ws = []
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                xi = x0 + dx
                yi = y0 + dy
                ok = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
                pids.append(
                    jnp.clip(yi, 0, height - 1) * width
                    + jnp.clip(xi, 0, width - 1)
                )
                ws.append(jnp.where(ok, weight * wy * wx, 0.0))
        pid = jnp.concatenate(pids)
        w = jnp.concatenate(ws)
        if sort:
            order = jnp.argsort(pid)
            pid, w = pid[order], w[order]
        flat = jax.ops.segment_sum(
            w, pid, num_segments=hw, indices_are_sorted=sort
        )
        return flat.reshape(height, width)
    raise ValueError(mode)


@partial(jax.jit, static_argnames=("height", "width", "chunk"))
def event_count_image(x, y, mask, height: int, width: int, chunk: int = 4096):
    """Unsigned per-pixel event counts (nearest assignment)."""
    return splat_image(
        x, y, mask.astype(jnp.float32), height, width, mode="nearest", chunk=chunk
    )


def time_image(x, y, t, mask, height: int, width: int, chunk: int = 4096):
    """Average-timestamp surface (commonly needed by event-camera pipelines):
    returns (sum_t image, count image); average = sum / max(count, 1)."""
    sum_t = splat_image(x, y, t * mask, height, width, mode="nearest", chunk=chunk)
    cnt = splat_image(x, y, mask.astype(t.dtype), height, width, mode="nearest", chunk=chunk)
    return sum_t, cnt
