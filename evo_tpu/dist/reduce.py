"""Distributed reductions: sharded normal-equation assembly for BA.

The BA observation set is sharded over the ``batch`` axis; each device
linearizes its observations and the block normal equations (Hpp, Hll, A,
bp, bl) are `psum`-reduced over ICI before the (replicated, tiny) Schur
solve — the distributed counterpart of the reference's single-threaded
SPARSE_SCHUR (`visual_odometry.cpp:486-497`; SURVEY.md §2.3 item 4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from evo_tpu.dist.mesh import BATCH_AXIS
from evo_tpu.vo.ba import _obs_linearize
from evo_tpu.solve.lm import huber_weights


def sharded_normal_equations(mesh, poses, landmarks, intr, obs_frame, obs_lm,
                             obs_p2d, obs_mask, pose_fixed, huber: float = 0.8):
    """One distributed linearization pass: observations sharded over
    ``batch``; returns replicated (Hpp [F,6,6], Hll [L,3,3], A [L,F,6,3],
    bp [F,6], bl [L,3]) after psum."""
    F = poses.shape[0]
    L = landmarks.shape[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(BATCH_AXIS), P(BATCH_AXIS), P(BATCH_AXIS),
                  P(BATCH_AXIS), P()),
        out_specs=(P(), P(), P(), P(), P()),
    )
    def run(poses, landmarks, intr, of, ol, op, om, fixed):
        w_mask = om.astype(poses.dtype)
        p = poses[of]
        x = landmarks[ol]
        r, Jp, Jl = jax.vmap(_obs_linearize, in_axes=(0, 0, None, 0))(
            p, x, intr, op
        )
        s = jnp.sum(r * r, axis=-1)
        w = huber_weights(s, huber) * w_mask
        Jp = jnp.where(fixed[of][:, None, None], 0.0, Jp)
        wr = r * w[:, None]
        Hpp = jnp.zeros((F, 6, 6), poses.dtype).at[of].add(
            jnp.einsum("oij,oik->ojk", Jp * w[:, None, None], Jp)
        )
        Hll = jnp.zeros((L, 3, 3), poses.dtype).at[ol].add(
            jnp.einsum("oij,oik->ojk", Jl * w[:, None, None], Jl)
        )
        A = jnp.zeros((L, F, 6, 3), poses.dtype).at[ol, of].add(
            jnp.einsum("oij,oik->ojk", Jp * w[:, None, None], Jl)
        )
        bp = jnp.zeros((F, 6), poses.dtype).at[of].add(
            jnp.einsum("oij,oi->oj", Jp, wr)
        )
        bl = jnp.zeros((L, 3), poses.dtype).at[ol].add(
            jnp.einsum("oij,oi->oj", Jl, wr)
        )
        # allreduce the partial blocks over the observation shards
        return jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a, BATCH_AXIS), (Hpp, Hll, A, bp, bl)
        )

    return run(poses, landmarks, intr, obs_frame, obs_lm, obs_p2d, obs_mask,
               pose_fixed)
