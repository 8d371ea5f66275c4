"""Checkpoint / resume subsystem.

The reference has no in-process checkpointing (SURVEY.md §5: its nearest
artifact is the resumable event-read cursor and the trajectory.txt
round-trip). This module makes mid-sequence resume a real subsystem: the
complete pipeline state — patch table, gradient store, track logs, VO map,
keyframes, GT bookkeeping, and the replay cursor — serializes to a single
``.npz`` (arrays) + embedded JSON (policy state), and a restored Evaluator
continues from the exact frame where the checkpoint was taken.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from evo_tpu.run.evaluator import Evaluator
from evo_tpu.tracker import patch_state as ps
from evo_tpu.vo.keyframe import Keyframe

_TABLE_FIELDS = [f.name for f in dataclasses.fields(ps.PatchTable)]


def state_dict(ev: Evaluator) -> dict:
    """Extract the full pipeline state as plain numpy/JSON-able data."""
    ev.sync_vo()  # drain the async-VO queue before snapshotting VO state
    tr = ev.tracker
    state: dict = {}
    for name in _TABLE_FIELDS:
        state[f"table.{name}"] = np.asarray(getattr(tr.table, name))
    state["tracker.grads"] = np.asarray(tr.grads)
    state["tracker.slot_refcount"] = tr.slot_refcount.copy()
    state["tracker.slot_birth"] = tr.slot_birth.copy()
    state["tracker.pstate.slot_birth"] = np.asarray(tr.pstate.slot_birth)
    if tr.prev_image is not None:
        state["tracker.prev_image"] = np.asarray(tr.prev_image)
    if getattr(ev, "_comp_warm_vel", None) is not None:
        # compensation warm-start chain: resuming cold would solve the
        # next window from zeros and diverge from the uninterrupted run
        state["comp.warm_vel"] = np.asarray(ev._comp_warm_vel)

    # one source of truth for track-id allocation: the host path consumes
    # next_track_id, the fused device-policy path consumes pstate.next_tid.
    # Whichever ran last is ahead; persist the max so a checkpoint taken
    # from either path resumes into either path without reassigning ids.
    unified_tid = max(tr.next_track_id, int(np.asarray(tr.pstate.next_tid)))
    meta = {
        "image_num": ev.image_num,
        "last_compensation_us": ev._last_compensation_us,
        "tracker": {
            "next_track_id": unified_tid,
            "epoch_us": tr.epoch_us,
            "num_images": tr.num_images,
            "newest_slot": tr._newest_slot,
            "pstate_next_tid": unified_tid,
            "pstate_frame_no": int(np.asarray(tr.pstate.frame_no)),
            "trajectories": {str(k): v for k, v in tr.trajectories.items()},
            "final_cost_log": tr.final_cost_log,
            "archived_tracks": sorted(tr.archived_tracks),
        },
    }
    if ev.vo is not None:
        vo = ev.vo
        meta["vo"] = {
            "without_add": vo.without_add,
            "active_frames": {
                str(t): {
                    "pose": kf.pose.tolist(),
                    "landmarks": {str(k): v.tolist() for k, v in kf.landmarks.items()},
                }
                for t, kf in vo.active_frames.items()
            },
            "stored_poses": [kf.pose.tolist() for kf in vo.stored_frames],
            "stored_ts": [kf.t_us for kf in vo.stored_frames],
            "landmarks": {str(k): v.tolist() for k, v in vo.map.landmarks.items()},
            "observations": {str(k): v for k, v in vo.map.observations.items()},
            "gt_list": [g.tolist() for g in vo.gt_list],
            "zero_gt": vo.zero_gt.tolist() if vo.zero_gt is not None else None,
        }
    state["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    return state


def save_checkpoint(path: str, ev: Evaluator) -> str:
    import os

    out = path if path.endswith(".npz") else path + ".npz"
    parent = os.path.dirname(os.path.abspath(out))
    os.makedirs(parent, exist_ok=True)
    np.savez_compressed(out, **state_dict(ev))
    return out


def restore_into(ev: Evaluator, state: dict) -> Evaluator:
    """Load a state dict into a freshly constructed Evaluator (same dataset
    and params as at save time)."""
    meta = json.loads(bytes(state["meta"]).decode())
    tr = ev.tracker
    table_kwargs = {
        name: jnp.asarray(state[f"table.{name}"]) for name in _TABLE_FIELDS
    }
    tr.table = ps.PatchTable(**table_kwargs)
    tr.grads = jnp.asarray(state["tracker.grads"])
    tr.slot_refcount = np.asarray(state["tracker.slot_refcount"]).copy()
    if "tracker.prev_image" in state:
        tr.prev_image = jnp.asarray(state["tracker.prev_image"])
    tmeta = meta["tracker"]
    # both allocators resume from the SAME counter (max of the two persisted
    # values — robust to checkpoints written before the counters were
    # unified, and to pre-round-2 checkpoints with no pstate at all, where
    # a fresh pstate would otherwise restart ids at 0)
    unified_tid = max(tmeta["next_track_id"], tmeta.get("pstate_next_tid", 0))
    tr.next_track_id = unified_tid
    tr.epoch_us = tmeta["epoch_us"]
    tr.num_images = tmeta["num_images"]
    from evo_tpu.tracker import policy as _policy

    if "tracker.slot_birth" in state:
        tr.slot_birth = np.asarray(state["tracker.slot_birth"]).copy()
        tr._newest_slot = tmeta["newest_slot"]
        tr.pstate = _policy.PolicyState(
            slot_birth=jnp.asarray(state["tracker.pstate.slot_birth"]),
            next_tid=jnp.asarray(unified_tid, jnp.int32),
            frame_no=jnp.asarray(tmeta["pstate_frame_no"], jnp.int32),
        )
    else:
        tr.pstate = dataclasses.replace(
            tr.pstate, next_tid=jnp.asarray(unified_tid, jnp.int32)
        )
    tr.trajectories = {
        int(k): [tuple(e) for e in v] for k, v in tmeta["trajectories"].items()
    }
    tr.final_cost_log = [tuple(e) for e in tmeta["final_cost_log"]]
    tr.archived_tracks = set(tmeta["archived_tracks"])

    ev.image_num = meta["image_num"]
    ev._last_compensation_us = meta["last_compensation_us"]
    if "comp.warm_vel" in state:
        ev._comp_warm_vel = jnp.asarray(state["comp.warm_vel"])

    if ev.vo is not None and "vo" in meta:
        vm = meta["vo"]
        vo = ev.vo
        vo.without_add = vm["without_add"]
        vo.active_frames = {
            int(t): Keyframe(
                t_us=int(t),
                landmarks={int(k): np.asarray(v) for k, v in d["landmarks"].items()},
                pose=np.asarray(d["pose"]),
            )
            for t, d in vm["active_frames"].items()
        }
        vo.stored_frames = [
            Keyframe(t_us=int(t), landmarks={}, pose=np.asarray(p))
            for t, p in zip(vm["stored_ts"], vm["stored_poses"])
        ]
        vo.map.landmarks = {int(k): np.asarray(v) for k, v in vm["landmarks"].items()}
        vo.map.observations = {int(k): list(v) for k, v in vm["observations"].items()}
        vo.gt_list = [np.asarray(g) for g in vm["gt_list"]]
        vo.gt_aligned = list(vo.gt_list)
        vo.zero_gt = np.asarray(vm["zero_gt"]) if vm["zero_gt"] is not None else None
    return ev


def load_checkpoint(path: str, dataset, params=None) -> Evaluator:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        state = {k: z[k] for k in z.files}
    ev = Evaluator(dataset, params)
    return restore_into(ev, state)
