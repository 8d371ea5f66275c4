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

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from evo_tpu.dist.mesh import BATCH_AXIS, SPACE_AXIS
from evo_tpu.kernels.splat import splat_image


def sharded_splat(mesh, x, y, weight, height: int, width: int, *,
                  mode: str = "bilinear", chunk: int = 4096):
    """Data-parallel event decode: shard the event stream, splat locally,
    `psum` the accumulators. x, y, weight: [N] with N divisible by the
    batch-axis size (pad with weight=0). Returns the replicated [H, W]."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(BATCH_AXIS), P(BATCH_AXIS), P(BATCH_AXIS)),
        out_specs=P(),
    )
    def run(xs, ys, ws):
        local = splat_image(xs, ys, ws, height, width, mode=mode, chunk=chunk)
        return jax.lax.psum(local, BATCH_AXIS)

    return run(x, y, weight)


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
