"""Device-resident per-frame policy — association, slot allocation, insertion.

The reference runs its per-frame bookkeeping as host control flow over a
patch list (`FeatureDetector::newImage`, feature_detector.cpp:493-541:
greedy corner association :630-664, per-frame gradient-slot refcounting
:512-535). Round-1 kept that policy on the host, which costs one synchronous
device→host round trip per frame window — ~45 ms through a remote-TPU
tunnel, i.e. the entire real-time budget of a 50 ms window.

This module moves the exact same policy into jitted device code over the
fixed-capacity patch table, so the whole frame step (event-window scan +
Harris + policy + table mutation) is ONE dispatch with no synchronous pull;
the host consumes a deferred log one window later. Every rule matches the
host reference implementation (detector.EventTracker._frame_policy) row- and
rank-order exactly; tests/test_tracker.py asserts parity on randomized
scenarios.

Policy rules mirrored (row order = reference list order):
- gradient-slot allocation: first slot with zero live references, else evict
  the slot with the oldest detection frame and kill its patches
  (detector.py round-1 fix of the reference's silent overwrite);
- greedy association: each live patch claims its nearest unclaimed corner
  within `association_distance` (feature_detector.cpp:630-664);
- insertion: k-th unclaimed corner → k-th free row, bounded by the live cap
  (feature_detector.cpp:653-663, maxPatches feature_detector.h:30).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from evo_tpu.tracker import patch_state as ps


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PolicyState:
    """Device-resident policy state (host copies lag one window)."""

    slot_birth: jax.Array  # [SLOTS] int32 detection-frame number, -1 = never
    next_tid: jax.Array  # [] int32 next track id to allocate
    frame_no: jax.Array  # [] int32 detection-frame counter


def empty_state(n_slots: int = ps.GRAD_SLOTS) -> PolicyState:
    return PolicyState(
        slot_birth=jnp.full(n_slots, -1, jnp.int32),
        next_tid=jnp.asarray(0, jnp.int32),
        frame_no=jnp.asarray(0, jnp.int32),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TableView:
    """The policy's read-only slice of the patch table — the four control
    fields the frame decisions depend on. Tiny ([P]-sized), so under a mesh
    every shard can afford to `all_gather` the full view and compute the
    identical global decisions (the policy's argmin/cumsum/greedy walk are
    table-wide and order-sensitive; computing them on a shard would change
    association winners)."""

    alive: jax.Array  # [P] bool
    center: jax.Array  # [P, 2] f32
    track_id: jax.Array  # [P] int32
    grad_slot: jax.Array  # [P] int32

    @property
    def capacity(self) -> int:
        return self.alive.shape[0]


def view_of(table: ps.PatchTable) -> TableView:
    return TableView(
        alive=table.alive, center=table.center,
        track_id=table.track_id, grad_slot=table.grad_slot,
    )


def gathered_view(table, axis_names, axis_sizes) -> TableView:
    """Full-table view from inside `shard_map` with the table's leading axis
    sharded over `axis_names` (sizes `axis_sizes`, same order): each shard
    scatters its rows into a zero-padded global array at its block offset and
    one `psum` fuses them (a few KB). psum — rather than all_gather — so the
    result is *typed* replicated (vma-empty): every decision derived from it
    is provably identical across shards, which is what lets the policy state
    leave the shard_map with an out_spec of P(). Block order matches the
    PartitionSpec (axis tuple major-to-minor)."""
    p_loc = table.alive.shape[0]
    lin = jnp.int32(0)
    for name, size in zip(axis_names, axis_sizes):
        lin = lin * size + jax.lax.axis_index(name)
    n_total = 1
    for size in axis_sizes:
        n_total *= size

    def g(a):
        work = a.astype(jnp.int32) if a.dtype == jnp.bool_ else a
        full = jnp.zeros((n_total * p_loc,) + a.shape[1:], work.dtype)
        full = jax.lax.dynamic_update_slice_in_dim(full, work, lin * p_loc, 0)
        full = jax.lax.psum(full, axis_names)
        return full.astype(bool) if a.dtype == jnp.bool_ else full

    return TableView(
        alive=g(table.alive), center=g(table.center),
        track_id=g(table.track_id), grad_slot=g(table.grad_slot),
    )


def slot_refcounts(table: ps.PatchTable, n_slots: int) -> jax.Array:
    """[SLOTS] live references per gradient slot — stateless recompute of the
    reference's `used_` refcount (optimizer.h:51-53): a slot is referenced by
    every live patch born on it."""
    ref = table.alive & (table.track_id >= 0)
    return (
        jnp.zeros(n_slots, jnp.int32)
        .at[table.grad_slot]
        .add(ref.astype(jnp.int32))
    )


def frame_policy(table, state: PolicyState, corners_xy,
                 corners_ok, *, max_patches: int, association_distance: float):
    """The per-frame policy on device. `table` is a full `ps.PatchTable` or
    a (possibly all_gathered) `TableView` — only the four control fields are
    read. corners_xy [C, 2] f32, corners_ok [C].

    Returns (decisions dict, new_state). Decisions:
      slot      [] int32   gradient slot for this frame
      evict     [P] bool   patches killed by slot eviction
      new_mask  [P] bool   rows receiving a new detection
      new_center[P, 2] f32
      new_tid   [P] int32  (-1 where not new)
      n_new     [] int32
    """
    P = table.capacity
    C = corners_xy.shape[0]
    big = jnp.float32(3.4e38)

    # -- gradient slot allocation / eviction ------------------------------
    ref = slot_refcounts(table, state.slot_birth.shape[0])
    has_free = jnp.any(ref == 0)
    first_free = jnp.argmax(ref == 0)  # first index with zero refcount
    oldest = jnp.argmin(state.slot_birth)  # first minimum = host np.argmin
    slot = jnp.where(has_free, first_free, oldest).astype(jnp.int32)
    evict = (~has_free) & table.alive & (table.grad_slot == slot)
    alive = table.alive & ~evict
    n_live = jnp.sum(alive.astype(jnp.int32))

    # -- greedy association (row order == reference list order) -----------
    d2 = jnp.sum(
        (corners_xy[None, :, :] - table.center[:, None, :]) ** 2, axis=-1
    )  # [P, C]
    d2 = jnp.where(corners_ok[None, :], d2, big)
    thresh2 = jnp.float32(association_distance * association_distance)

    def body(i, claimed):
        di = jnp.where(claimed, big, d2[i])
        j = jnp.argmin(di)
        take = alive[i] & (di[j] < thresh2)
        return claimed.at[j].set(claimed[j] | take)

    claimed = jax.lax.fori_loop(0, P, body, jnp.zeros(C, bool))

    # -- insertion: k-th unclaimed corner -> k-th free row ----------------
    sel_c = corners_ok & ~claimed
    c_rank = jnp.cumsum(sel_c.astype(jnp.int32))  # 1-based where sel_c
    free_r = ~alive
    r_rank = jnp.cumsum(free_r.astype(jnp.int32))
    budget = jnp.maximum(0, max_patches - n_live)
    k_max = jnp.minimum(budget, jnp.where(sel_c, c_rank, 0).max(initial=0))
    match = (
        free_r[:, None]
        & sel_c[None, :]
        & (r_rank[:, None] == c_rank[None, :])
        & (r_rank[:, None] <= k_max)
    )  # [P, C] — at most one true per row and per column
    new_mask = jnp.any(match, axis=1)
    new_center = jnp.einsum(
        "pc,cd->pd", match.astype(jnp.float32), corners_xy
    )
    new_tid = jnp.where(
        new_mask, state.next_tid + r_rank - 1, -1
    ).astype(jnp.int32)
    n_new = jnp.sum(new_mask.astype(jnp.int32))

    new_state = PolicyState(
        slot_birth=state.slot_birth.at[slot].set(state.frame_no),
        next_tid=state.next_tid + n_new,
        frame_no=state.frame_no + 1,
    )
    decisions = dict(
        slot=slot, evict=evict, new_mask=new_mask,
        new_center=new_center, new_tid=new_tid, n_new=n_new,
    )
    return decisions, new_state
