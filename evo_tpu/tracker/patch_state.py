"""Patch table: fixed-capacity struct-of-arrays feature-track state.

TPU-native replacement of the reference's `Patch` / `Patches =
std::list<Patch>` (`implementation/feature_tracker/include/feature_tracker/
patch.h:14-130`, `src/patch.cpp`): the per-feature mutable object with a
bounded event deque becomes one dataclass-of-arrays with an `alive` mask and
per-patch ring buffers, so every per-patch operation (event routing,
integration, alignment, budget update) is a single batched kernel over the
whole table instead of a serial list walk (`feature_detector.cpp:585-619`).

Reference constants mirrored:
- patch extent 12 → 25x25 px (`feature_detector.h:15`)
- event budget init 75, clamped to [100, 300]
  (`patch.cpp:22`, `patch.h:113-114`, `patch.cpp:208-212`)
- ready when >= 30 new events AND buffer full (`patch.cpp:296-299`)
- max live patches 100 (`feature_detector.h:30`)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

PATCH_EXTENT = 12
PATCH_SIDE = 2 * PATCH_EXTENT + 1  # 25
MAX_PATCHES = 128  # table capacity (reference live cap is 100)
MAX_EVENTS = 320  # ring capacity >= maxNumOfEvents (300)
INIT_NUM_EVENTS = 75
MIN_NUM_EVENTS = 100
MAX_NUM_EVENTS = 300
READY_COUNTER = 30
GRAD_SLOTS = MAX_PATCHES  # one gradient-frame slot per possible birth frame


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PatchTable:
    """Device-resident patch state. Leading dim = MAX_PATCHES everywhere."""

    alive: jax.Array  # [P] bool — slot occupied and not lost
    initialized: jax.Array  # [P] bool — warp/flow bootstrapped (Patch::isInit)
    track_id: jax.Array  # [P] int32, -1 for free slots
    center: jax.Array  # [P, 2] f32 current rect center (x, y)
    init_pt: jax.Array  # [P, 2] f32 center at detection (Patch::initPoint_)
    warp: jax.Array  # [P, 4] SE2 params mapping current->keyframe coords
    flow: jax.Array  # [P] f32 flow angle (rad)
    num_of_events: jax.Array  # [P] int32 adaptive event budget
    counter: jax.Array  # [P] int32 events since last optimize (Patch::counter_)
    # event ring buffer, append-at-write_ptr, wraps; fields (t_rel_s, x, y, sign)
    ev_t: jax.Array  # [P, E] f32 seconds relative to table epoch t0_us
    ev_x: jax.Array  # [P, E] f32
    ev_y: jax.Array  # [P, E] f32
    ev_p: jax.Array  # [P, E] f32
    ev_count: jax.Array  # [P] int32 total events ever routed (size = min(count, E))
    grad_slot: jax.Array  # [P] int32 index into the gradient-frame store
    final_costs: jax.Array  # [P, 5] f32 rolling final-cost history
    n_costs: jax.Array  # [P] int32 number of recorded costs
    cur_t: jax.Array  # [P] f32 current timestamp (rel s) — mid of batch
    last_update_t: jax.Array  # [P] f32
    time_without_update: jax.Array  # [P] f32 seconds

    @property
    def capacity(self) -> int:
        return self.alive.shape[0]


def empty_table(p: int = MAX_PATCHES, e: int = MAX_EVENTS) -> PatchTable:
    f = jnp.zeros
    return PatchTable(
        alive=f(p, bool),
        initialized=f(p, bool),
        track_id=jnp.full(p, -1, jnp.int32),
        center=f((p, 2), jnp.float32),
        init_pt=f((p, 2), jnp.float32),
        warp=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (p, 1)),
        flow=f(p, jnp.float32),
        num_of_events=jnp.full(p, INIT_NUM_EVENTS, jnp.int32),
        counter=f(p, jnp.int32),
        ev_t=f((p, e), jnp.float32),
        ev_x=f((p, e), jnp.float32),
        ev_y=f((p, e), jnp.float32),
        ev_p=f((p, e), jnp.float32),
        ev_count=f(p, jnp.int32),
        grad_slot=f(p, jnp.int32),
        final_costs=f((p, 5), jnp.float32),
        n_costs=f(p, jnp.int32),
        cur_t=f(p, jnp.float32),
        last_update_t=f(p, jnp.float32),
        time_without_update=jnp.full(p, 10.0, jnp.float32),  # init 10 s (patch.cpp:31-32)
    )


def is_ready(table: PatchTable) -> jax.Array:
    """Patch::isReady — >= READY_COUNTER new events and a full buffer
    (patch.cpp:296-299)."""
    size = jnp.minimum(table.ev_count, table.ev_t.shape[1])
    return (table.counter >= READY_COUNTER) & (size >= table.num_of_events)


def route_events(table: PatchTable, ex, ey, et, ep, ev_mask) -> PatchTable:
    """Append each event to every live patch whose current rect contains it —
    the batched form of the per-event `isInPatch -> addEvent` walk
    (`feature_detector.cpp:585-597`, `patch.cpp:37-47`).

    ex, ey, et, ep: [N] event coords / rel-time / sign; ev_mask: [N] validity.
    Events must be in window (time) order. Ring append keeps the newest
    `MAX_EVENTS` per patch; integration later takes the newest
    `num_of_events` (the deque-bound semantics).
    """
    p, e = table.ev_t.shape
    n = ex.shape[0]
    inx = jnp.abs(ex[None, :] - table.center[:, 0:1]) <= PATCH_EXTENT
    iny = jnp.abs(ey[None, :] - table.center[:, 1:2]) <= PATCH_EXTENT
    hit = inx & iny & table.alive[:, None] & ev_mask[None, :]  # [P, N]

    # ring positions: for each patch, k-th hit goes to (count + rank) % E.
    # Only the newest <= E hits can survive the ring ("later writes win"),
    # and those occupy E *distinct* slots — so the scatter becomes an exact
    # SUM: slot j of patch p receives its unique kept hit's event index (+1)
    # via separable one-hot contractions on the MXU (the same image = YT@X
    # trick as kernels.splat), instead of a [P·N]-update scatter, which XLA
    # lowers to serialized per-element stores on TPU (~10 ms per sub-batch
    # at P=128, N=5000 — the single hottest op of the window scan).
    rank1 = jnp.cumsum(hit, axis=1, dtype=jnp.int32)  # [P, N] 1-based rank
    tot = rank1[:, -1:]  # [P, 1] total hits
    keep = hit & (rank1 > tot - e)  # newest <= E hits -> distinct slots
    slot = (table.ev_count[:, None] + rank1 - 1) % e  # [P, N]
    if e % 16 == 0:
        f32 = jnp.float32
        e_hi = e // 16
        hi_grid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e_hi), 2)
        lo_grid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 16), 2)
        oh_hi = ((slot[:, :, None] // 16 == hi_grid) & keep[:, :, None])
        oh_lo = (slot[:, :, None] % 16 == lo_grid)
        # event index n+1, split into base-128 digits so every matmul runs
        # at DEFAULT (single-pass bf16) precision exactly: digits <= 127 and
        # one-hot entries are exact in bf16; each output slot receives at
        # most one nonzero product; accumulation (and the digit recombine,
        # all values < 2^24) is f32
        val = jnp.arange(1, n + 1, dtype=jnp.int32)[None, :, None]
        # materialize the big [P, N, ·] one-hot operands in bf16 (exact for
        # {0, 1} and digits <= 127): the contraction is HBM-bound on these
        # tensors, so halving their bytes is the dominant cost lever
        bf = jnp.bfloat16
        oh_hi_b = oh_hi.astype(bf)
        ring_i = 0
        for shift in range(0, max(1, int(n).bit_length()), 7):
            digit = ((val >> shift) & 127).astype(bf)
            contrib = jnp.einsum(
                "pnh,pnl->phl",
                oh_hi_b,
                oh_lo.astype(bf) * digit,
                preferred_element_type=f32,
            )
            ring_i = ring_i + float(1 << shift) * contrib
        ring_new = ring_i.reshape(p, e).astype(jnp.int32) - 1
    else:
        # fallback: one scatter of event indices (later writes win = ring)
        pos = (table.ev_count[:, None] + rank1 - 1) % e
        flat_idx = (jnp.arange(p)[:, None] * e + pos).astype(jnp.int32)
        oob = p * e  # dropped by mode="drop" for non-hits
        tgt = jnp.where(hit, flat_idx, oob).ravel()
        src = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None, :], (p, n)
        ).ravel()
        ring_new = (
            jnp.full(p * e, -1, jnp.int32).at[tgt].set(src, mode="drop")
        ).reshape(p, e)
    fresh = ring_new >= 0
    take = jnp.where(fresh, ring_new, 0)

    def merge(buf, val):
        return jnp.where(fresh, val[take], buf)

    new_count = table.ev_count + jnp.sum(hit, axis=1).astype(jnp.int32)
    new_counter = table.counter + jnp.sum(hit, axis=1).astype(jnp.int32)
    return dataclasses.replace(
        table,
        ev_t=merge(table.ev_t, et),
        ev_x=merge(table.ev_x, ex),
        ev_y=merge(table.ev_y, ey),
        ev_p=merge(table.ev_p, ep),
        ev_count=new_count,
        counter=new_counter,
    )


def newest_events(table: PatchTable):
    """Per patch: (t, x, y, p, valid) arrays [P, E] ordered with ring layout,
    valid marking the newest min(count, num_of_events) entries — the
    integration set (the deque keeps only the newest `numOfEvents`,
    patch.cpp:37-47)."""
    p, e = table.ev_t.shape
    idx = jnp.arange(e)[None, :]  # ring slot index
    count = table.ev_count[:, None]
    size = jnp.minimum(count, e)
    # age of slot i: how many events ago it was written (0 = newest)
    last = (count - 1) % e
    age = (last - idx) % e
    in_buf = age < size
    take = jnp.minimum(size, table.num_of_events[:, None])
    valid = in_buf & (age < take)
    return table.ev_t, table.ev_x, table.ev_y, table.ev_p, valid


def host_mirror(table: PatchTable) -> dict:
    """Pull the small control fields to host numpy (for per-frame policy).
    One packed transfer — on a remote-attached TPU, 7 separate pulls would
    cost 7 tunnel round trips (~0.5 s) per call."""
    from evo_tpu.core.fetch import fetch

    return fetch(dict(
        alive=table.alive,
        initialized=table.initialized,
        track_id=table.track_id,
        center=table.center,
        ev_count=table.ev_count,
        num_of_events=table.num_of_events,
        grad_slot=table.grad_slot,
        cur_t=table.cur_t,
    ))
