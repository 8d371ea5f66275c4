"""Motion compensation by per-tile contrast (edge) maximization + TV.

Capability counterpart of `FeatureDetector::compensateEventsContrast`
(`feature_detector.cpp:298-464`) with the functors in
`contrast_functor.h:10-292` and `total_variance.h:10-22`:

- the sensor plane is cut into 20x20 px tiles (12x9 on DAVIS240C);
- each tile with > 100 events gets a translational velocity ℓ that warps its
  events to the window's mid-time, splats them as 7x7 Gaussians (σ=1,
  1/(2πσ²) normalization) into a 3x-padded tile image, and is scored by an
  *edge* loss: maxRes − Σ NMS₅ₓ₅(λ₁(structure tensor)) / maxRes, with an
  escape penalty maxRes·(1+‖ℓ‖²) when all events leave the padded tile;
- neighboring tiles are coupled by per-component TV residuals w·|ℓp − ℓq|
  under a Huber(10) loss, w = 1e3;
- the solved field warps every event (nearest splat of *counts*) into the
  final motion-compensated image.

TPU redesign: the Ceres SPARSE_NORMAL_CHOLESKY solve becomes a custom
block-structured LM — each tile residual depends on only its own 2 params,
so Jacobians are per-tile `jacfwd` with 2 tangents (vmapped across tiles),
and the TV terms contribute closed-form ±w entries; the damped normal system
(2T × 2T, T = 108) is solved densely. The Gaussian splat is the separable
matmul splat from evo_tpu.kernels.splat, differentiable w.r.t. velocities.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from evo_tpu.kernels.splat import splat_image
from evo_tpu.solve.lm import huber_weights

MAX_RES = 1e3  # maxPossibleResidual_ (contrast_functor.h:283)
SIGMA_SPLAT = 1.0
SPLAT_RADIUS = 3
SIGMA_ST = 1.5
K_ST = 3
K_NMS = 2
GAUSS_NORM = 1.0 / (2.0 * np.pi * SIGMA_SPLAT * SIGMA_SPLAT)


@dataclasses.dataclass(frozen=True)
class CompensateParams:
    """Mirrors the compensate* fields of DetectorParams (feature_detector.h:23-29)."""

    tile: int = 20
    tv_weight: float = 1e3
    tv_huber: float = 10.0
    scale: float = 1e-3  # µs → ms time scaling of velocities
    min_events: int = 100
    max_iters: int = 50
    events_per_tile_cap: int = 4096
    loss: str = "edge"  # 'edge' | 'variance' (contrast_functor.h:101-277)


def _gauss_kernel2d(sigma, radius, dtype=jnp.float32):
    r = jnp.arange(-radius, radius + 1, dtype=dtype)
    g = jnp.exp(-0.5 * (r / sigma) ** 2) * (
        1.0 / jnp.sqrt(2.0 * jnp.pi * sigma * sigma)
    )
    return g


def _band_blur_matrix(size: int, sigma: float, radius: int, dtype=jnp.float32):
    """[size, size] banded Toeplitz matrix of a truncated 1-D Gaussian:
    (B @ a) blurs axis 0 with zero boundary handling."""
    i = jnp.arange(size, dtype=dtype)
    d = i[:, None] - i[None, :]
    g = jnp.exp(-0.5 * (d / sigma) ** 2) * (
        1.0 / jnp.sqrt(2.0 * jnp.pi * sigma * sigma)
    )
    return jnp.where(jnp.abs(d) <= radius, g, 0.0)


def tile_edge_loss(img):
    """The edge score Σ NMS(λ₁(ST)) of a padded tile image
    (`calculateEdgeLoss`, contrast_functor.h:166-277). img [3H, 3W]."""
    h3, w3 = img.shape
    # forward differences on [0, 3H-1) x [0, 3W-1); borders stay 0
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[: h3 - 1, : w3 - 1].set(
        img[: h3 - 1, 1:w3] - img[: h3 - 1, : w3 - 1]
    )
    gy = gy.at[: h3 - 1, : w3 - 1].set(
        img[1:h3, : w3 - 1] - img[: h3 - 1, : w3 - 1]
    )
    # Gaussian-weighted structure tensor. The separable blur runs as two
    # banded-Toeplitz matmuls B @ a @ Bᵀ instead of conv_general_dilated:
    # a single-channel conv pads its channel dims onto the MXU's 128 lanes
    # (~128x wasted work for C=1), while [S, S] matmuls batch perfectly over
    # the vmapped tiles. Zero padding == the reference's bounds-masked
    # accumulation since grads are 0 outside.
    by = _band_blur_matrix(h3, SIGMA_ST, K_ST, img.dtype)
    bx = _band_blur_matrix(w3, SIGMA_ST, K_ST, img.dtype)

    def blur(a):
        return (by @ a @ bx.T).astype(img.dtype)

    sxx = blur(gx * gx)
    sxy = blur(gx * gy)
    syy = blur(gy * gy)
    tr = sxx + syy
    # tr² − 4·det == (sxx−syy)² + 4·sxy² >= 0; clamp before sqrt so the
    # forward-mode derivative is 0 (not NaN) on the vast empty regions
    disc2 = (sxx - syy) ** 2 + 4.0 * sxy * sxy
    disc = jnp.sqrt(jnp.maximum(disc2, 1e-12))
    lam1 = jnp.maximum(0.5 * (tr + disc), 0.0)
    # 5x5 block NMS at stride 2 (kernelSizeNMS_=2), then sum of maxima.
    # init must be -inf so XLA uses the max-pool primitive (the generic
    # reduce_window has no batchable JVP); lam1 >= 0 so results are equal.
    nms = jax.lax.reduce_window(
        lam1, -jnp.inf, jax.lax.max,
        (2 * K_NMS + 1, 2 * K_NMS + 1), (K_NMS, K_NMS), "VALID",
    )
    return jnp.sum(jnp.maximum(nms, 0.0))


def tile_variance_loss(img):
    """Variance score of the positive pixels of a padded tile image — the
    reference's alternative contrast objective (`calculateVarianceLoss`,
    contrast_functor.h:101-150; present but not wired to the solve there,
    kept here for the same capability surface). Returns the variance
    Σ(v−mean)²/count over pixels > 0, with the counter seeded at 1 like the
    reference's `counterNonZero = 1`."""
    pos = img > 0.0
    cnt = jnp.sum(pos) + 1.0
    mean = jnp.sum(jnp.where(pos, img, 0.0)) / cnt
    var = jnp.sum(jnp.where(pos, (img - mean) ** 2, 0.0)) / cnt
    return jnp.where(mean > 0.0, var, 0.0)


def tile_residual(vel, data, tile: int, scale: float, loss: str = "edge"):
    """Scalar contrast residual of one tile (`contrastFunctor::operator()`).

    vel [2]; data = (ex, ey, dt_us, valid, tl_x, tl_y, active) with per-tile
    padded event arrays [E]; dt_us = t_mid − t_event in µs.
    loss: 'edge' (calculateEdgeLoss, the one the reference calls) or
    'variance' (calculateVarianceLoss).
    """
    ex, ey, dt_us, valid, tlx, tly, active = data
    shift = dt_us * scale  # µs·(1e-3) → effective ms units
    cx = ex + shift * vel[0]
    cy = ey + shift * vel[1]
    # padded tile coords: + tile offsets the 1-tile pad ring
    px = cx - tlx + tile
    py = cy - tly + tile
    w = jnp.where(valid, GAUSS_NORM, 0.0)
    img = splat_image(
        px, py, w, 3 * tile, 3 * tile,
        mode="gaussian", sigma=SIGMA_SPLAT, radius=SPLAT_RADIUS,
        chunk=min(1024, ex.shape[0]),
    )
    escaped = jnp.mean(img) <= 1e-4
    if loss == "edge":
        score = tile_edge_loss(img) / MAX_RES
    elif loss == "variance":
        score = tile_variance_loss(img)
    else:
        raise ValueError(loss)
    r_normal = MAX_RES - score
    r_escape = MAX_RES * (1.0 + vel[0] * vel[0] + vel[1] * vel[1])
    r = jnp.where(escaped, r_escape, r_normal)
    return jnp.where(active, r, 0.0)


def _edges(ty: int, tx: int):
    """Horizontal + vertical neighbor index pairs over a ty x tx tile grid."""
    ids = np.arange(ty * tx).reshape(ty, tx)
    h = np.stack([ids[:, :-1].ravel(), ids[:, 1:].ravel()], axis=1)
    v = np.stack([ids[:-1, :].ravel(), ids[1:, :].ravel()], axis=1)
    return np.concatenate([h, v], axis=0)  # [E, 2]


@partial(jax.jit, static_argnames=("tile", "scale", "tv_weight", "tv_huber", "max_iters", "loss"))
def solve_motion_field(
    tile_data,
    edge_idx,
    *,
    tile: int,
    scale: float,
    tv_weight: float,
    tv_huber: float,
    max_iters: int,
    loss: str = "edge",
    v_init=None,
):
    """Block-structured LM over per-tile velocities [T, 2].

    tile_data: pytree of per-tile arrays (see tile_residual), leading dim T.
    edge_idx: [E, 2] int32 neighbor pairs.
    v_init: optional [T, 2] warm start — the previous window's solved field.
    Motion fields are temporally smooth at the 15 k-event window cadence, so
    warm-starting typically halves the accepted-LM-step count before the
    function_tolerance termination fires; the termination criteria (and so
    the solution quality contract) are unchanged, and a degenerate init can
    only cost iterations, never correctness (LM rejects ascent steps).
    """
    T = tile_data[0].shape[0]
    res_fn = partial(tile_residual, tile=tile, scale=scale, loss=loss)

    def tiles_r_J(v):
        def one(vi, di):
            r = res_fn(vi, di)
            J = jax.jacfwd(res_fn)(vi, di)
            return r, J

        return jax.vmap(one)(v, tile_data)  # [T], [T, 2]

    def tv_residuals(v):
        d = v[edge_idx[:, 0]] - v[edge_idx[:, 1]]  # [E, 2]
        return tv_weight * jnp.abs(d), d

    def total_cost(v):
        r = jax.vmap(lambda vi, di: res_fn(vi, di))(v, tile_data)
        rtv, _ = tv_residuals(v)
        s = jnp.sum(rtv**2, axis=1)  # block squared norms
        n = jnp.sqrt(s + 1e-12)
        rho = jnp.where(n <= tv_huber, s, 2.0 * tv_huber * n - tv_huber**2)
        return jnp.sum(r * r) + jnp.sum(rho)

    def step(state):
        v, lam, cost, it, done = state
        r, J = tiles_r_J(v)  # [T], [T, 2]
        # normal equations A x = -b over flattened [2T]
        A = jnp.zeros((2 * T, 2 * T), v.dtype)
        b = jnp.zeros(2 * T, v.dtype)
        # tile blocks: diag 2x2 per tile
        JJ = J[:, :, None] * J[:, None, :]  # [T, 2, 2]
        rows = (2 * jnp.arange(T))[:, None, None] + jnp.arange(2)[None, :, None]
        cols = (2 * jnp.arange(T))[:, None, None] + jnp.arange(2)[None, None, :]
        A = A.at[rows, cols].add(JJ)
        b = b.at[(2 * jnp.arange(T))[:, None] + jnp.arange(2)[None, :]].add(
            J * r[:, None]
        )
        # TV blocks (IRLS Huber weight per edge block; GN of w|δ| == weighted
        # quadratic with Jᵀr = w²δ)
        rtv, d = tv_residuals(v)
        s = jnp.sum(rtv**2, axis=1)
        omega = huber_weights(s, tv_huber)  # [E]
        w2 = omega * tv_weight * tv_weight
        p, q = edge_idx[:, 0], edge_idx[:, 1]
        for c in range(2):
            A = A.at[2 * p + c, 2 * p + c].add(w2)
            A = A.at[2 * q + c, 2 * q + c].add(w2)
            A = A.at[2 * p + c, 2 * q + c].add(-w2)
            A = A.at[2 * q + c, 2 * p + c].add(-w2)
            b = b.at[2 * p + c].add(w2 * d[:, c])
            b = b.at[2 * q + c].add(-w2 * d[:, c])
        diag = jnp.clip(jnp.diag(A), 1e-8, None)
        A_d = A + lam * jnp.diag(diag)
        L, low = jax.scipy.linalg.cho_factor(A_d, lower=True)
        delta = -jax.scipy.linalg.cho_solve((L, low), b)
        bad = ~jnp.all(jnp.isfinite(delta))
        delta = jnp.where(bad, 0.0, delta)
        v_new = v + delta.reshape(T, 2)
        cost_new = total_cost(v_new)
        accept = jnp.isfinite(cost_new) & (cost_new < cost) & ~bad
        # Ceres-style early termination (function_tolerance 1e-6): each
        # iteration re-splats every tile's events twice, so paying all
        # `max_iters` trips when the solve converges in a handful was the
        # single largest device cost of the pipeline (the reference's <=50
        # is a CAP — Ceres stops on function_tolerance, and this solve is
        # typically done in ~5-10 accepted steps). Damping past any useful
        # scale (every recent step rejected) also ends the solve.
        rel_decrease = (cost - cost_new) / jnp.maximum(cost, 1e-12)
        done = (accept & (rel_decrease < 1e-6)) | (lam > 1e5)
        v = jnp.where(accept, v_new, v)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        cost = jnp.where(accept, cost_new, cost)
        return v, lam, cost, it + 1, done

    # derive the init from the tile data so its varying-manual-axes type
    # matches the body output when this solve runs (vmapped) inside a
    # shard_map (dist.temporal batches windows over the mesh batch axis)
    v0 = jnp.zeros((T, 2), jnp.float32) + 0.0 * tile_data[0].ravel()[0]
    if v_init is not None:
        vi = jnp.asarray(v_init, jnp.float32).reshape(T, 2)
        # a non-finite carry (e.g. from a poisoned previous window) must
        # not seed the solve
        v0 = v0 + jnp.where(jnp.all(jnp.isfinite(vi)), vi, 0.0)
    cost0 = total_cost(v0)
    lam0 = jnp.float32(1e-4) + 0.0 * cost0
    done0 = (cost0 * 0.0).astype(bool)
    v, _, cost, _, _ = jax.lax.while_loop(
        lambda s: (s[3] < max_iters) & ~s[4], step,
        (v0, lam0, cost0, (cost0 * 0.0).astype(jnp.int32), done0),
    )
    return v, cost, cost0


def build_tile_data(
    x: np.ndarray,
    y: np.ndarray,
    t_us: np.ndarray,
    params: CompensateParams | None = None,
    height: int = 180,
    width: int = 240,
):
    """Host-side tile bucketing for the contrast-max solve: bucket events by
    tile, build per-tile padded gather arrays (the reference partitions the
    window into 20x20 tiles the same way, feature_detector.cpp:301-356).

    Returns (tile_data tuple for `tile_residual`, edge_idx [E, 2] int32,
    ty, tx, tiy*tx+tix tile ids [N], t_mid).
    """
    p = params or CompensateParams()
    tx_n = width // p.tile
    ty_n = height // p.tile
    T = tx_n * ty_n
    n = len(x)
    t_mid = 0.5 * (float(t_us[0]) + float(t_us[-1])) if n else 0.0

    tix = np.clip(x.astype(np.int64) // p.tile, 0, tx_n - 1)
    tiy = np.clip(y.astype(np.int64) // p.tile, 0, ty_n - 1)
    tid = tiy * tx_n + tix
    order = np.argsort(tid, kind="stable")
    counts = np.bincount(tid, minlength=T)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # per-tile padded capacity: the smallest power-of-two bucket that holds
    # the fullest tile (few distinct buckets → few recompiles), capped at
    # events_per_tile_cap. A fixed 4096 cap would make every tile pay ~30x
    # the splat FLOPs of its actual occupancy (~140 events/tile for a 15k
    # window on the 12x9 grid).
    need = int(counts.max()) if n else 1
    E = min(p.events_per_tile_cap, max(256, 1 << (need - 1).bit_length()))
    gather = np.zeros((T, E), np.int64)
    valid = np.zeros((T, E), bool)
    tid_sorted = tid[order]
    pos_in_tile = np.arange(n) - starts[tid_sorted]
    keep = pos_in_tile < E
    gather[tid_sorted[keep], pos_in_tile[keep]] = order[keep]
    valid[tid_sorted[keep], pos_in_tile[keep]] = True

    ex = jnp.asarray(x[gather], jnp.float32)
    ey = jnp.asarray(y[gather], jnp.float32)
    dt = jnp.asarray((t_mid - t_us[gather]).astype(np.float32))
    tlx = jnp.asarray((np.arange(T) % tx_n * p.tile).astype(np.float32))
    tly = jnp.asarray((np.arange(T) // tx_n * p.tile).astype(np.float32))
    active = jnp.asarray(counts > p.min_events)
    tile_data = (ex, ey, dt, jnp.asarray(valid), tlx, tly, active)
    edge_idx = jnp.asarray(_edges(ty_n, tx_n), jnp.int32)
    return tile_data, edge_idx, ty_n, tx_n, tid, t_mid


def compensate_window(
    x: np.ndarray,
    y: np.ndarray,
    t_us: np.ndarray,
    params: CompensateParams | None = None,
    height: int = 180,
    width: int = 240,
    mesh=None,
    defer: bool = False,
    v_init=None,
):
    """Full window compensation (host orchestration + jitted solve).

    With `defer=True`, returns a handle whose `.get()` yields the result
    tuple — the device→host transfer overlaps later work instead of
    blocking this window (nothing downstream in the pipeline consumes the
    compensated image; it feeds artifacts/visualization only).

    With `mesh` (a (space, batch) jax.sharding.Mesh), the tile solve runs
    space-sharded via `dist.tiling.sharded_tile_solve_data` — tile columns
    sharded over the space axis, TV coupling across shard boundaries by halo
    exchange; the result matches the single-device solve up to summation
    order.

    Returns (motion_field [TY, TX, 2], compensated_image [H, W] of counts,
    solve_cost, initial_cost).
    """
    p = params or CompensateParams()
    tile_data, edge_idx, ty_n, tx_n, tid, t_mid = build_tile_data(
        x, y, t_us, p, height, width
    )

    if mesh is not None:
        from evo_tpu.dist.tiling import sharded_tile_solve_data

        vel, cost, cost0 = sharded_tile_solve_data(
            mesh, tile_data,
            ty=ty_n, tx=tx_n, tile=p.tile, scale=p.scale,
            tv_weight=p.tv_weight, tv_huber=p.tv_huber,
            max_iters=p.max_iters, loss=p.loss, v_init=v_init,
        )
    else:
        vel, cost, cost0 = solve_motion_field(
            tile_data, edge_idx,
            tile=p.tile, scale=p.scale, tv_weight=p.tv_weight,
            tv_huber=p.tv_huber, max_iters=p.max_iters, loss=p.loss,
            v_init=v_init,
        )

    # final image: nearest splat of counts at compensated positions
    # (feature_detector.cpp:433-463 — note: value 1 per event, not polarity).
    # Everything is fetched in ONE device→host transfer: each pull through a
    # remote-attached TPU tunnel costs ~45 ms of round-trip latency, so four
    # separate np.asarray/float() pulls would dominate the whole window.
    img = _compensated_count_splat(
        vel, jnp.asarray(tid, jnp.int32),
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray((t_mid - t_us).astype(np.float32)),
        p.scale, height, width,
    )
    from evo_tpu.core.fetch import fetch, fetch_async

    tree = dict(
        vel=vel.reshape(ty_n, tx_n, 2), img=img,
        cost=cost.astype(jnp.float32), cost0=cost0.astype(jnp.float32),
    )

    def unpack(d):
        return d["vel"], d["img"], float(d["cost"]), float(d["cost0"])

    if defer:
        handle = fetch_async(tree)

        class _Deferred:
            # the solved field as a DEVICE array: the pipeline chains it
            # into the next window's v_init without a host round trip
            vel_dev = vel

            def get(self):
                return unpack(handle.get())

        return _Deferred()
    return unpack(fetch(tree))


@partial(jax.jit, static_argnames=("scale", "height", "width"))
def _compensated_count_splat(vel, tile_id, x, y, dt_us, scale, height, width):
    """Nearest count splat of all events shifted by their tile's velocity —
    device-side so the motion field never needs a host round trip."""
    v = vel[tile_id]  # [N, 2]
    shift = dt_us * scale
    cx = jnp.round(x + shift * v[:, 0])
    cy = jnp.round(y + shift * v[:, 1])
    return _count_splat(cx, cy, height, width)


@partial(jax.jit, static_argnames=("height", "width"))
def _count_splat(cx, cy, height: int, width: int):
    ones = jnp.ones_like(cx)
    return splat_image(cx, cy, ones, height, width, mode="nearest")
