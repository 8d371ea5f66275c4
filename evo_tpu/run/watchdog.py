"""Failure detection and recovery — SURVEY §5 auxiliary subsystem A3.

The reference has no failure handling beyond throw-on-bad-file and
algorithmic lost-filters (SURVEY.md §5 "Failure detection / elastic
recovery: none"). A TPU production pipeline needs one: a long-running
device-resident state (patch table, gradient store, VO map) hit by a
non-finite value — a kernel bug, a pathological window, a preempted chip —
would otherwise silently poison every later window.

`HealthMonitor` rides the host mirrors the pipeline already pulls (zero
extra device traffic):

- per-window invariant checks on the post-frame mirror (finite centers,
  live-count within capacity, track-id sanity) and on VO poses;
- on failure: quarantine — kill the offending patches on device (their rows
  are masked, the healthy rest of the table is untouched) and log the event;
- periodic auto-checkpoints (run.checkpoint) so an unrecoverable failure or
  a killed process resumes from the last good window (`auto_resume`).
"""

from __future__ import annotations

import dataclasses
import logging
import os

import numpy as np

_log = logging.getLogger(__name__)


@dataclasses.dataclass
class WatchdogParams:
    check_every: int = 1  # windows between mirror checks
    auto_checkpoint_every: int = 0  # windows; 0 = disabled
    checkpoint_path: str = "/tmp/evo_autockpt.npz"


@dataclasses.dataclass
class FailureEvent:
    window: int
    kind: str
    detail: str


class HealthMonitor:
    """Failure detector + recovery hooks for an Evaluator-driven pipeline."""

    def __init__(self, params: WatchdogParams | None = None):
        self.params = params or WatchdogParams()
        self.failures: list[FailureEvent] = []
        self.windows = 0
        self.recovered_patches = 0

    # -- detection ---------------------------------------------------------
    def check_mirror(self, mirror: dict) -> np.ndarray:
        """Validate a post-frame patch-table mirror. Returns a [P] bool mask
        of BAD rows (empty-all-False when healthy)."""
        alive = mirror["alive"]
        center = mirror["center"]
        bad = alive & ~np.all(np.isfinite(center), axis=-1)
        if bad.any():
            self._record("patch_nonfinite",
                         f"{int(bad.sum())} live patches with non-finite centers")
        if int(alive.sum()) > alive.shape[0]:
            self._record("capacity", "live count exceeds table capacity")
        return bad

    def check_vo(self, vo) -> bool:
        """Validate VO state: finite active poses and landmarks."""
        ok = True
        for t, kf in vo.active_frames.items():
            if not np.all(np.isfinite(kf.pose)):
                self._record("vo_pose_nonfinite", f"keyframe t={t}")
                ok = False
        for tid, p in vo.map.landmarks.items():
            if not np.all(np.isfinite(p)):
                self._record("vo_landmark_nonfinite", f"track {tid}")
                ok = False
        return ok

    def _record(self, kind: str, detail: str) -> None:
        ev = FailureEvent(self.windows, kind, detail)
        self.failures.append(ev)
        _log.error("watchdog: %s — %s (window %d)", kind, detail, ev.window)

    # -- recovery ----------------------------------------------------------
    def quarantine_patches(self, tracker, bad: np.ndarray) -> None:
        """Kill the bad rows on device; the rest of the table is untouched.
        The tracker's normal lifecycle re-detects features on the next frame,
        so tracking degrades for one window instead of dying."""
        import jax.numpy as jnp

        if not bad.any():
            return
        tracker.table = dataclasses.replace(
            tracker.table, alive=tracker.table.alive & jnp.asarray(~bad)
        )
        self.recovered_patches += int(bad.sum())

    def drop_bad_landmarks(self, vo) -> int:
        """Remove non-finite landmarks from the map (BA treats the tracks as
        new observations afterwards)."""
        bad = [t for t, p in vo.map.landmarks.items()
               if not np.all(np.isfinite(p))]
        for t in bad:
            vo.map.landmarks.pop(t, None)
            vo.map.observations.pop(t, None)
        return len(bad)

    # -- driver hook -------------------------------------------------------
    def after_window(self, evaluator, mirror: dict | None = None) -> None:
        """Call once per consumed frame window."""
        self.windows += 1
        p = self.params
        if mirror is not None and self.windows % p.check_every == 0:
            bad = self.check_mirror(mirror)
            if bad.any():
                self.quarantine_patches(evaluator.tracker, bad)
            if evaluator.vo is not None and not self.check_vo(evaluator.vo):
                self.drop_bad_landmarks(evaluator.vo)
        if p.auto_checkpoint_every and self.windows % p.auto_checkpoint_every == 0:
            from evo_tpu.run import checkpoint

            checkpoint.save_checkpoint(p.checkpoint_path, evaluator)

    def summary(self) -> dict:
        return dict(
            windows=self.windows,
            failures=[dataclasses.asdict(f) for f in self.failures],
            recovered_patches=self.recovered_patches,
        )


def auto_resume(path: str, dataset, params=None):
    """Resume an Evaluator from the last auto-checkpoint if one exists,
    else construct fresh — the elastic-restart entry point."""
    from evo_tpu.run import checkpoint
    from evo_tpu.run.evaluator import Evaluator

    if os.path.exists(path):
        ev = checkpoint.load_checkpoint(path, dataset, params)
        _log.info("watchdog: resumed from %s at frame %d", path, ev.image_num)
        return ev, True
    return Evaluator(dataset, params), False
