"""Distributed event decode and tile-parallel contrast maximization.

The sharded counterparts of the single-chip kernels:

- `sharded_splat`: events are sharded over the ``batch`` axis; each device
  splats its sub-stream into a full-sensor accumulator and a single `psum`
  over ICI produces the global event image. Event splatting is a pure sum
  over events, so sharding the stream is exact (no halo needed) — the halo
  problem only appears when the *image* is sharded (see halo.py).
- `sharded_tile_solve_data`: the contrast-max tile grid is sharded over the
  ``space`` axis; each device owns a contiguous block of tile columns and
  the TV coupling across the shard boundary uses halo-exchanged neighbor
  velocities (SURVEY.md §2.3 items 2/4).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from evo_tpu.dist.mesh import BATCH_AXIS, SPACE_AXIS
from evo_tpu.kernels.splat import splat_image


def sharded_splat(mesh, x, y, weight, height: int, width: int, *,
                  mode: str = "bilinear", chunk: int = 4096):
    """Data-parallel event decode: shard the event stream, splat locally,
    `psum` the accumulators. x, y, weight: [N] with N divisible by the
    batch-axis size (pad with weight=0). Returns the replicated [H, W]."""
    return _build_sharded_splat(mesh, height, width, mode, chunk)(x, y, weight)


@lru_cache(maxsize=None)
def _build_sharded_splat(mesh, height: int, width: int, mode: str, chunk: int):
    """Compile-once factory for the sharded decode (re-tracing the shard_map
    closure per call costs more than the decode itself on small windows)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(BATCH_AXIS), P(BATCH_AXIS), P(BATCH_AXIS)),
        out_specs=P(),
    )
    def run(xs, ys, ws):
        local = splat_image(xs, ys, ws, height, width, mode=mode, chunk=chunk)
        return jax.lax.psum(local, BATCH_AXIS)

    return jax.jit(run)


def sharded_patch_solve(mesh, solve_fn, table_batch, grads):
    """Patch-parallel alignment: the patch table's leading axis is sharded
    over ``batch``; each device runs the vmapped LM on its shard. No
    collectives are needed — patch solves are independent (the reference
    runs them serially, feature_detector.cpp:585-619)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(BATCH_AXIS), P()),
        out_specs=P(BATCH_AXIS),
    )
    def run(tbl, g):
        return solve_fn(tbl, g)

    return run(table_batch, grads)


def space_shard_tiles(mesh, tile_field):
    """Place a [TY, TX, ...] per-tile field with TX sharded over ``space``."""
    spec = P(None, SPACE_AXIS)
    return jax.device_put(tile_field, NamedSharding(mesh, spec))


def sharded_tile_solve_data(
    mesh,
    tile_data,
    *,
    ty: int,
    tx: int,
    tile: int,
    scale: float,
    tv_weight: float,
    tv_huber: float,
    max_iters: int,
    loss: str = "edge",
    v_init=None,
):
    """Space-sharded contrast-max motion-field solve.

    The distributed counterpart of `compensate.solve_motion_field`
    (reference `feature_detector.cpp:298-464`): the tile grid's columns are
    sharded over the ``space`` mesh axis, so each device runs the expensive
    per-tile work (Gaussian splat + structure-tensor edge loss + `jacfwd`
    Jacobian) only for its own tile columns. The TV coupling across a shard
    boundary (`feature_detector.cpp:369-396`) reads the right neighbor's
    first velocity column via `halo.exchange_halo` (ppermute over ICI). The
    collective ships only the COMPRESSED system pieces — per-tile 2x2
    blocks, per-tile gradient terms, and per-owned-edge TV terms, ~(6T+3E)/n
    floats per device via all_gather — never the assembled dense [2T, 2T]
    matrix (psum'ing that full matrix from every device was the 8-device
    collapse recorded in SCALING_r03). Every device then assembles and
    solves the identical tiny damped system (2T x 2T, T = ty*tx = 108 on
    DAVIS240C) from the gathered pieces — the update is exact, not
    block-Jacobi, and matches the 1-device solve up to summation order.

    tile_data: the per-tile pytree from `compensate.compensate_window`,
    leading dim T = ty*tx, row-major (tid = tiy*tx + tix); tx must be
    divisible by the mesh's space-axis size.

    Returns (vel [T, 2] replicated, cost, cost0).
    """
    n_space = mesh.shape[SPACE_AXIS]
    if tx % n_space:
        raise ValueError(f"tx={tx} not divisible by space axis {n_space}")
    # reshape [T, ...] -> [ty, tx, ...] so axis 1 shards over space
    grid_data = tuple(
        a.reshape((ty, tx) + a.shape[1:]) for a in tile_data
    )
    run = _build_tile_solver(
        mesh, ty, tx, tile, scale, tv_weight, tv_huber, max_iters, loss
    )
    if v_init is None:
        vi = jnp.zeros((ty, tx, 2), jnp.float32)
    else:
        vi = jnp.asarray(v_init, jnp.float32).reshape(ty, tx, 2)
    v_grid, cost, cost0 = run(grid_data, vi)
    return v_grid.reshape(ty * tx, 2), cost, cost0


@lru_cache(maxsize=None)
def _build_tile_solver(mesh, ty, tx, tile, scale, tv_weight, tv_huber,
                       max_iters, loss):
    """Compile-once factory for the shard_map'ed tile solve (see
    `sharded_tile_solve_data`); cached on the static config so repeated
    windows reuse the executable."""
    from evo_tpu.dist.halo import exchange_halo
    from evo_tpu.solve.lm import huber_weights
    from evo_tpu.tracker.compensate import tile_residual

    n_space = mesh.shape[SPACE_AXIS]
    txl = tx // n_space
    T = ty * tx
    res_fn = partial(tile_residual, tile=tile, scale=scale, loss=loss)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(tuple(P(None, SPACE_AXIS) for _ in range(7)),
                  P(None, SPACE_AXIS)),
        out_specs=(P(None, SPACE_AXIS), P(), P()),
    )
    def run(gdata, v_init_grid):
        dev = jax.lax.axis_index(SPACE_AXIS)
        ldata = jax.tree.map(
            lambda a: a.reshape((ty * txl,) + a.shape[2:]), gdata
        )
        # owned TV edges (left/top endpoint owns the edge): vertical
        # (i,j)-(i+1,j) all local cols; horizontal interior (i,j)-(i,j+1)
        # for j < txl-1; boundary (i,txl-1)-(i, right nbr col 0). Only the
        # VALIDITY mask is device-dependent here — the global index lists
        # live in the static ep_g/eq_g tables below.
        n_vh = (ty - 1) * txl + ty * (txl - 1)
        has_right = dev < n_space - 1
        edge_ok = jnp.concatenate(
            [
                jnp.ones(n_vh, bool),
                jnp.full(ty, has_right),
            ]
        )

        def edge_diffs(v_loc):
            """Per-owned-edge velocity differences [E_own, 2]; the boundary
            column's right neighbor comes from the halo exchange."""
            vg = v_loc.reshape(ty, txl, 2)
            _, from_right = exchange_halo(vg, SPACE_AXIS, width=1, axis=1)
            dv = vg[:-1] - vg[1:]  # [ty-1, txl, 2]
            dh = (
                vg[:, :-1] - vg[:, 1:]
                if txl > 1
                else jnp.zeros((ty, 0, 2), v_loc.dtype)
            )
            db = vg[:, -1] - from_right[:, 0]  # [ty, 2]
            d = jnp.concatenate(
                [dv.reshape(-1, 2), dh.reshape(-1, 2), db.reshape(-1, 2)]
            )
            return jnp.where(edge_ok[:, None], d, 0.0)

        def local_cost(v_loc):
            r = jax.vmap(res_fn)(v_loc, ldata)
            d = edge_diffs(v_loc)
            s = jnp.sum((tv_weight * jnp.abs(d)) ** 2, axis=1)
            n = jnp.sqrt(s + 1e-12)
            rho = jnp.where(n <= tv_huber, s, 2.0 * tv_huber * n - tv_huber**2)
            return jnp.sum(r * r) + jnp.sum(jnp.where(edge_ok, rho, 0.0))

        def global_cost(v_loc):
            return jax.lax.psum(local_cost(v_loc), SPACE_AXIS)

        # global edge index lists of EVERY device's owned edges, in the
        # exact order each device emits them ([n_space, E_l] static hosts
        # constants) — lets the all-gathered per-edge (w2, d) pieces scatter
        # into the dense system without shipping index arrays over ICI
        def _dev_edges(d_):
            g = np.arange(ty)[:, None] * tx + d_ * txl + np.arange(txl)[None, :]
            vp, vq = g[:-1, :].reshape(-1), g[1:, :].reshape(-1)
            if txl > 1:
                hp, hq = g[:, :-1].reshape(-1), g[:, 1:].reshape(-1)
            else:
                hp = hq = np.zeros(0, np.int64)
            bp = g[:, -1]
            bq = np.minimum(g[:, -1] + 1, T - 1)
            return (np.concatenate([vp, hp, bp]), np.concatenate([vq, hq, bq]))

        ep_g = jnp.asarray(np.stack([_dev_edges(d_)[0] for d_ in range(n_space)]))
        eq_g = jnp.asarray(np.stack([_dev_edges(d_)[1] for d_ in range(n_space)]))

        def step(state):
            v, lam, cost, it, done = state
            r, J = jax.vmap(
                lambda vi, di: (res_fn(vi, di), jax.jacfwd(res_fn)(vi, di))
            )(v, ldata)
            JJ = J[:, :, None] * J[:, None, :]  # [Tl, 2, 2]
            Jr = J * r[:, None]  # [Tl, 2]
            d = edge_diffs(v)
            s = jnp.sum((tv_weight * jnp.abs(d)) ** 2, axis=1)
            omega = huber_weights(s, tv_huber)
            w2 = jnp.where(edge_ok, omega * tv_weight * tv_weight, 0.0)
            # COMPRESSED collective (VERDICT r3 item 4): all-gather the
            # per-tile 2x2 blocks, per-tile gradient pieces, and per-owned-
            # edge TV terms — ~(6T + 3E)/n floats per device — instead of
            # psum'ing a dense [2T, 2T] system every device had fully
            # assembled (T² floats each; the 8-device collapse in
            # SCALING_r03 was that redundant assembly + reduction). The
            # dense system is then built once per device from identical
            # gathered pieces, so the update stays EXACT, not block-Jacobi.
            JJ_g = jax.lax.all_gather(JJ, SPACE_AXIS)  # [n, Tl, 2, 2]
            Jr_g = jax.lax.all_gather(Jr, SPACE_AXIS)  # [n, Tl, 2]
            w2_g = jax.lax.all_gather(w2, SPACE_AXIS).reshape(-1)  # [n*E_l]
            d_g = jax.lax.all_gather(d, SPACE_AXIS).reshape(-1, 2)
            # local tiles are column blocks: device d_ owns grid cols
            # [d_*txl, (d_+1)*txl); reorder [n, ty, txl] -> flat [T]
            def grid_order(a):
                return (
                    a.reshape((n_space, ty, txl) + a.shape[2:])
                    .transpose((1, 0, 2) + tuple(range(3, a.ndim + 1)))
                    .reshape((T,) + a.shape[2:])
                )

            JJ_full = grid_order(JJ_g)  # [T, 2, 2]
            Jr_full = grid_order(Jr_g)  # [T, 2]

            # The global damped solve is inherently serial (one tiny dense
            # system for the whole grid), so exactly ONE device assembles
            # and factorizes it — lax.cond skips the branch everywhere else
            # — and a [2T]-float psum broadcasts the update. Replicating
            # the cho_factor on every shard (SPMD default) is wasted energy
            # on real chips and, on a virtual CPU mesh, n x redundant work
            # on the same cores — the residual gap after the compressed
            # collective in SCALING_r03's 8-device collapse.
            def assemble_and_solve(_):
                A = jnp.zeros((2 * T, 2 * T), v.dtype)
                b = jnp.zeros(2 * T, v.dtype)
                allt = jnp.arange(T)
                rows = (2 * allt)[:, None, None] + jnp.arange(2)[None, :, None]
                cols = (2 * allt)[:, None, None] + jnp.arange(2)[None, None, :]
                A = A.at[rows, cols].add(JJ_full)
                b = b.at[(2 * allt)[:, None] + jnp.arange(2)[None, :]].add(Jr_full)
                p_, q_ = ep_g.reshape(-1), eq_g.reshape(-1)
                # masked edges carry w2 = 0 and d = 0, so their
                # (clipped-index) scatter contributions are exact no-ops
                for c in range(2):
                    A = A.at[2 * p_ + c, 2 * p_ + c].add(w2_g)
                    A = A.at[2 * q_ + c, 2 * q_ + c].add(w2_g)
                    A = A.at[2 * p_ + c, 2 * q_ + c].add(-w2_g)
                    A = A.at[2 * q_ + c, 2 * p_ + c].add(-w2_g)
                    b = b.at[2 * p_ + c].add(w2_g * d_g[:, c])
                    b = b.at[2 * q_ + c].add(-w2_g * d_g[:, c])
                diag = jnp.clip(jnp.diag(A), 1e-8, None)
                A_d = A + lam * jnp.diag(diag)
                L, low = jax.scipy.linalg.cho_factor(A_d, lower=True)
                return -jax.scipy.linalg.cho_solve((L, low), b)

            delta = jax.lax.cond(
                dev == 0, assemble_and_solve,
                # the zero branch must carry the same varying-manual-axes
                # type as the solve branch (which inherits it from the
                # gathered pieces)
                lambda _: jnp.zeros(2 * T, v.dtype) + zv, None,
            )
            delta = jax.lax.psum(delta, SPACE_AXIS)  # broadcast from dev 0
            bad = ~jnp.all(jnp.isfinite(delta))
            delta = jnp.where(bad, 0.0, delta)
            # each device takes its own columns of the global update
            dg = delta.reshape(ty, tx, 2)
            d_loc = jax.lax.dynamic_slice(
                dg, (0, dev * txl, 0), (ty, txl, 2)
            ).reshape(-1, 2)
            v_new = v + d_loc
            cost_new = global_cost(v_new)
            accept = jnp.isfinite(cost_new) & (cost_new < cost) & ~bad
            # same Ceres-style early termination as the 1-device solve
            # (compensate.solve_motion_field) — identical accept sequence,
            # so sharded == single still holds window for window
            rel_decrease = (cost - cost_new) / jnp.maximum(cost, 1e-12)
            done = (accept & (rel_decrease < 1e-6)) | (lam > 1e5)
            v = jnp.where(accept, v_new, v)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
            cost = jnp.where(accept, cost_new, cost)
            return v, lam, cost, it + 1, done

        # derive the init from the sharded input so its varying-manual-axes
        # type matches the body output (all_gather results are varying-typed,
        # so everything downstream of the assembly is too; while_loop rejects
        # a carry whose in/out manual-axes types differ)
        zv = 0.0 * ldata[0].ravel()[0]  # varying zero
        # warm start from the caller's field (this device's tile columns);
        # zeros = the cold init. A non-finite carry must not seed the solve
        # (same guard as compensate.solve_motion_field).
        vi = v_init_grid.reshape(ty * txl, 2).astype(jnp.float32)
        vi_ok = jax.lax.psum(
            jnp.all(jnp.isfinite(vi)).astype(jnp.int32), SPACE_AXIS
        ) == n_space
        v0 = jnp.where(vi_ok, vi, 0.0) + zv
        cost0 = global_cost(v0)
        v, _, cost, _, _ = jax.lax.while_loop(
            lambda s: (s[3] < max_iters) & ~s[4], step,
            (v0, jnp.float32(1e-4) + zv, cost0 + zv, zv.astype(jnp.int32),
             zv.astype(bool)),
        )
        # every device holds the identical cost (assembled from identical
        # gathered pieces); pmax re-replicates its varying type for the P()
        # out_spec
        cost = jax.lax.pmax(cost, SPACE_AXIS)
        # the sharded [ty, txl, 2] blocks concatenate into the full field
        # through the out_spec (P(None, space))
        return v.reshape(ty, txl, 2), cost, cost0

    return jax.jit(run)
