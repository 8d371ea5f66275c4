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
    # FINITE-garbage detector: a live track whose center moved more than
    # this many pixels between consecutive mirror checks is corrupted, not
    # tracking — the alignment solver's per-solve travel cap
    # (tracker/align.py anchored-window solve) bounds legitimate motion to
    # a few px per solve, and the lost-filter kills fast-drifting tracks
    # long before they cover 50 px in one window. 0 disables the check.
    teleport_px: float = 50.0


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
        # per-track last solve timestamp, for the monotonicity invariant
        self._last_cur_t: dict[int, float] = {}
        # per-track last center, for the finite-garbage teleport invariant
        self._last_center: dict[int, tuple[float, float]] = {}

    # -- detection ---------------------------------------------------------
    def check_mirror(self, mirror: dict, max_live: int | None = None) -> np.ndarray:
        """Validate a post-frame patch-table mirror. Returns a [P] bool mask
        of BAD rows (empty-all-False when healthy). Checks every invariant
        the mirror's keys allow (the fused-path framelog mirror carries a
        subset of the full host mirror):

        - live centers finite;
        - live count within the configured live cap (`max_live` =
          tracker params.max_patches — the reference's maxPatches cap,
          feature_detector.h:30);
        - live rows carry a non-negative track id (insertion always
          allocates one);
        - grad_slot within the gradient-store range [0, P) for live rows;
        - num_of_events positive and <= MAX_NUM_EVENTS (patch.cpp:208-212
          clamp, plus the INIT value);
        - per-track solve time `cur_t` non-decreasing across windows
          (events are routed in timestamp order, so a backwards jump means
          state corruption);
        - per-track center displacement bounded by `teleport_px` between
          consecutive checks — the FINITE-garbage invariant: a corrupted-
          but-finite center (a teleported row) keeps routing events and
          solving, so no NaN check can see it; a jump the solver's travel
          cap could never produce can.

        Undetectable by design (recorded, tests/test_watchdog.py): a finite
        budget corruption WITHIN (0, MAX_NUM_EVENTS] and a center nudged by
        less than `teleport_px` — both are inside the value ranges healthy
        tracking produces, so no invariant can separate them from signal;
        their blast radius is one track's quality, bounded by the lost-
        filter (median residual > threshold kills drifting tracks)."""
        from evo_tpu.tracker import patch_state as ps

        alive = mirror["alive"]
        center = mirror["center"]
        bad = alive & ~np.all(np.isfinite(center), axis=-1)
        if bad.any():
            self._record("patch_nonfinite",
                         f"{int(bad.sum())} live patches with non-finite centers")
        if max_live is not None and int(alive.sum()) > max_live:
            self._record(
                "capacity",
                f"live count {int(alive.sum())} exceeds cap {max_live}",
            )
        if "track_id" in mirror:
            bad_tid = alive & (mirror["track_id"] < 0)
            if bad_tid.any():
                self._record("track_id", f"{int(bad_tid.sum())} live rows "
                             "with unallocated track ids")
                bad = bad | bad_tid
        if "grad_slot" in mirror:
            gs = mirror["grad_slot"]
            bad_slot = alive & ((gs < 0) | (gs >= alive.shape[0]))
            if bad_slot.any():
                self._record("grad_slot", f"{int(bad_slot.sum())} live rows "
                             "with out-of-range gradient slots")
                bad = bad | bad_slot
        if "num_of_events" in mirror:
            noe = mirror["num_of_events"]
            bad_noe = alive & ((noe <= 0) | (noe > ps.MAX_NUM_EVENTS))
            if bad_noe.any():
                self._record("event_budget", f"{int(bad_noe.sum())} live rows "
                             f"with budgets outside (0, {ps.MAX_NUM_EVENTS}]")
                bad = bad | bad_noe
        if "cur_t" in mirror and "track_id" in mirror:
            cur_t = mirror["cur_t"]
            tid = mirror["track_id"]
            regressed = np.zeros_like(alive)
            for i in np.flatnonzero(alive & (tid >= 0)):
                t_prev = self._last_cur_t.get(int(tid[i]))
                if t_prev is not None and cur_t[i] < t_prev - 1e-6:
                    regressed[i] = True
                self._last_cur_t[int(tid[i])] = float(cur_t[i])
            if regressed.any():
                self._record("time_regression", f"{int(regressed.sum())} "
                             "tracks with backwards solve timestamps")
                bad = bad | regressed
        if "track_id" in mirror and self.params.teleport_px > 0:
            tid = mirror["track_id"]
            jumped = np.zeros_like(alive)
            finite_row = np.all(np.isfinite(center), axis=-1)
            for i in np.flatnonzero(alive & (tid >= 0) & finite_row):
                prev = self._last_center.get(int(tid[i]))
                cx, cy = float(center[i, 0]), float(center[i, 1])
                if prev is not None and np.hypot(
                    cx - prev[0], cy - prev[1]
                ) > self.params.teleport_px:
                    jumped[i] = True
                else:
                    # a flagged row's stored center is NOT advanced: the
                    # quarantine kills it, and a re-seeded track gets a
                    # fresh id
                    self._last_center[int(tid[i])] = (cx, cy)
            if jumped.any():
                self._record("teleport", f"{int(jumped.sum())} tracks "
                             f"jumped > {self.params.teleport_px:g} px "
                             "between checks (finite-garbage corruption)")
                bad = bad | jumped
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
    def quarantine_patches(self, tracker, bad: np.ndarray,
                           track_id: np.ndarray | None = None) -> None:
        """Kill the bad rows on device; the rest of the table is untouched.
        The tracker's normal lifecycle re-detects features on the next frame,
        so tracking degrades for one window instead of dying.

        `track_id` (the mirror's ids for the flagged rows) gates the kill on
        identity: under the pipelined drive the mirror that flagged a row can
        be up to pipeline_depth windows stale, and the row may since have
        been evicted and re-seeded with a NEW healthy detection
        (policy.py row reuse). Matching the device table's current track_id
        against the mirror's means a reused row is left alone — the stale
        fault died with the old occupant."""
        import jax.numpy as jnp

        if not bad.any():
            return
        bad_dev = jnp.asarray(bad)
        if track_id is not None:
            bad_dev = bad_dev & (tracker.table.track_id == jnp.asarray(track_id))
        tracker.table = dataclasses.replace(
            tracker.table, alive=tracker.table.alive & ~bad_dev
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
    def after_window(self, evaluator, mirror: dict | None = None,
                     check_vo: bool = True) -> None:
        """Call once per consumed frame window (main thread). With the async
        VO worker active, pass `check_vo=False` and enqueue `vo_check_task`
        on the worker instead — VO state is owned by that thread, so the
        invariant check must run there, ordered after the keyframes it
        guards. Under the pipelined drive a quarantine lands up to
        `pipeline_depth` windows after the fault was injected (the mirrors
        are consumed in batches); a NaN row is quiescent in the meantime
        (non-finite centers route no events and solve nothing), so the delay
        costs detection latency, not propagation."""
        self.windows += 1
        p = self.params
        if mirror is not None and self.windows % p.check_every == 0:
            bad = self.check_mirror(
                mirror, max_live=evaluator.tracker.params.max_patches
            )
            if bad.any():
                self.quarantine_patches(
                    evaluator.tracker, bad, track_id=mirror.get("track_id")
                )
            if check_vo and evaluator.vo is not None \
                    and not self.check_vo(evaluator.vo):
                self.drop_bad_landmarks(evaluator.vo)
        if p.auto_checkpoint_every and self.windows % p.auto_checkpoint_every == 0:
            from evo_tpu.run import checkpoint

            # drain the VO worker first: a checkpoint must snapshot a
            # consistent (tracker, VO) pair, and VO keyframes for already-
            # consumed windows may still be in flight on the worker
            evaluator.sync_vo()
            checkpoint.save_checkpoint(p.checkpoint_path, evaluator)

    def vo_check_task(self, evaluator) -> None:
        """The VO half of `after_window`, shaped to run ON the VO worker
        thread (queued after the keyframe submissions it validates)."""
        if evaluator.vo is not None and not self.check_vo(evaluator.vo):
            self.drop_bad_landmarks(evaluator.vo)

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
