"""Temporal windowing distributed over the device mesh (SURVEY §2.3 item 3).

The reference processes one 300 ms / 15 k-event compensation window at a
time (`evaluator.cpp:36-44`); here W buffered windows are solved in ONE
dispatch with the window axis sharded over the mesh's ``batch`` axis — the
sequence-parallel counterpart of the space-sharded tile solve
(dist.tiling.sharded_tile_solve_data). This is legal because compensation
windows are mutually independent: each tile solve reads only its own
window's events (contrast functor state is per-window,
`feature_detector.cpp:298-464`) and its output feeds artifacts and
visualization, not the tracker state, so deferring W windows and solving
them together preserves the reference's semantics exactly.

The *tracker* event path cannot be distributed this way: window k+1's ring
state depends on window k's solves (the reference's sequential
`updatePatches` walk, feature_detector.cpp:585-619), so the tracker scan
stays pipelined on one stream and shards the PATCH axis instead
(detector._sharded_window_scan).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from evo_tpu.dist.mesh import BATCH_AXIS


@lru_cache(maxsize=None)
def _build_batched_solver(mesh, ty, tx, tile, scale, tv_weight, tv_huber,
                          max_iters, loss):
    """Compile-once factory: shard_map over the window axis; each device
    vmaps the full single-device tile solve over its local windows. No
    inter-window collectives exist (windows are independent) — the mesh
    buys pure throughput."""
    from evo_tpu.tracker.compensate import _edges, solve_motion_field

    edge_idx = jnp.asarray(_edges(ty, tx), jnp.int32)
    kw = dict(tile=tile, scale=scale, tv_weight=tv_weight,
              tv_huber=tv_huber, max_iters=max_iters, loss=loss)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(BATCH_AXIS),),
        out_specs=(P(BATCH_AXIS), P(BATCH_AXIS), P(BATCH_AXIS)),
    )
    def run(stacked):
        return jax.vmap(
            lambda td: solve_motion_field(td, edge_idx, **kw)
        )(stacked)

    return jax.jit(run)


def _pad_tile_data(td, e_max: int):
    """Pad one window's tile_data event axis ([T, E] fields) to e_max;
    padding entries are masked out via `valid`."""
    ex, ey, dt, valid, tlx, tly, active = td
    pad = e_max - ex.shape[1]
    if pad == 0:
        return td
    pe = ((0, 0), (0, pad))
    return (
        jnp.pad(ex, pe), jnp.pad(ey, pe), jnp.pad(dt, pe),
        jnp.pad(valid, pe, constant_values=False), tlx, tly, active,
    )


def compensate_windows_batched(windows, params=None, height: int = 180,
                               width: int = 240, mesh=None):
    """Solve W compensation windows in one device dispatch, windows sharded
    over the mesh ``batch`` axis (temporal/sequence parallelism).

    windows: list of (x, y, t_us) host arrays, one per window. Returns a
    list of (motion_field [TY, TX, 2], compensated_image [H, W], cost,
    cost0) in window order — identical results to calling
    `compensate.compensate_window` per window (up to padding-invariant
    arithmetic), as the parity test asserts.
    """
    from evo_tpu.core.fetch import fetch
    from evo_tpu.tracker import compensate as comp

    p = params or comp.CompensateParams()
    built = [
        comp.build_tile_data(x, y, t_us, p, height, width)
        for (x, y, t_us) in windows
    ]
    ty_n, tx_n = built[0][2], built[0][3]
    e_max = max(b[0][0].shape[1] for b in built)
    padded = [_pad_tile_data(b[0], e_max) for b in built]

    w = len(windows)
    n_batch = mesh.shape[BATCH_AXIS] if mesh is not None else 1
    # pad the window axis to a multiple of the batch size with inactive
    # copies of the last window (active=False tiles contribute zero
    # residual, so the padding windows cost ~nothing and are discarded)
    w_pad = (-w) % n_batch
    if w_pad:
        ex0, ey0, dt0, valid0, tlx0, tly0, active0 = padded[-1]
        dead = (ex0, ey0, dt0, jnp.zeros_like(valid0), tlx0, tly0,
                jnp.zeros_like(active0))
        padded = padded + [dead] * w_pad

    stacked = tuple(
        jnp.stack([win[i] for win in padded]) for i in range(7)
    )
    if mesh is not None:
        run = _build_batched_solver(
            mesh, ty_n, tx_n, p.tile, p.scale, p.tv_weight, p.tv_huber,
            p.max_iters, p.loss,
        )
        vels, costs, costs0 = run(stacked)
    else:
        from evo_tpu.tracker.compensate import _edges, solve_motion_field

        edge_idx = jnp.asarray(_edges(ty_n, tx_n), jnp.int32)
        vels, costs, costs0 = jax.vmap(
            lambda td: solve_motion_field(
                td, edge_idx, tile=p.tile, scale=p.scale,
                tv_weight=p.tv_weight, tv_huber=p.tv_huber,
                max_iters=p.max_iters, loss=p.loss,
            )
        )(stacked)

    # compensated count images per real window (cheap single pass next to
    # the LM solve; one packed fetch for everything)
    imgs = []
    for i, (x, y, t_us) in enumerate(windows):
        tid = built[i][4]
        t_mid = built[i][5]
        imgs.append(comp._compensated_count_splat(
            vels[i], jnp.asarray(tid, jnp.int32),
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray((t_mid - np.asarray(t_us)).astype(np.float32)),
            p.scale, height, width,
        ))
    pulled = fetch(dict(
        vel=vels[:w], cost=costs[:w], cost0=costs0[:w],
        imgs=jnp.stack(imgs),
    ))
    return [
        (
            pulled["vel"][i].reshape(ty_n, tx_n, 2),
            pulled["imgs"][i],
            float(pulled["cost"][i]),
            float(pulled["cost0"][i]),
        )
        for i in range(w)
    ]
