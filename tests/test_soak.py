"""Long-sequence lifecycle soak (SURVEY §7 hard part 6 / configs[3] analogue).

30 s of simulated stream at 20 fps — 600 frames, far beyond the 20-keyframe
window and the gradient-slot store — so the run churns through keyframe
eviction, landmark archival, patch death/rebirth, and gradient-slot
recycling. Asserts the whole pipeline stays numerically sane and the
Sim3-aligned trajectory error does not blow up relative to the short-run
level (tests/test_sim_quality.py).

Runs with a reduced table capacity (32 rows/slots): the vmapped solves cost
is proportional to capacity regardless of live count (static shapes), which
makes a 600-window run tractable on the CPU CI host — and slot recycling
kicks in after 32 detection frames instead of 128, so the recycling path is
exercised ~19x per run instead of ~4x.

The simulated dataset is generated once and cached under /tmp keyed by its
parameters; re-runs of the suite skip the ~1 min generation.
"""

import os

import numpy as np
import pytest

from evo_tpu.io import davis, sim
from evo_tpu.run.evaluator import Evaluator, EvaluatorParams
from evo_tpu.tracker.detector import TrackerParams
from evo_tpu.vo.frontend import VoParams

DURATION_S = 30.0
FPS = 20.0
CAPACITY = 32
_DS_DIR = f"/tmp/evo_soak_{int(DURATION_S)}s_{int(FPS)}fps_v1"


@pytest.fixture(scope="module")
def soak_dataset():
    marker = os.path.join(_DS_DIR, "events.txt")
    if not (os.path.exists(marker) and os.path.getsize(marker) > 0):
        s = sim.EventCameraSimulator(sim.SimParams(
            duration_s=DURATION_S, fps=FPS, seed=11, scene="3walls",
            substeps=4,
        ))
        sim.write_dataset(_DS_DIR, s.generate())
    return davis.Davis240cDataset(_DS_DIR)


class TestLongSequenceSoak:
    def test_lifecycle_churn_and_no_drift_blowup(self, soak_dataset, tmp_path):
        ds = soak_dataset
        ev = Evaluator(ds, EvaluatorParams(
            output_dir=str(tmp_path), run_compensation=False,
            tracker=TrackerParams(capacity=CAPACITY, max_patches=24),
            # inlier gates scale with the track count (the reference's 55
            # assumes 100 features; here the live cap is 24)
            vo=VoParams(num_inliers=14, ransac_min_inliers=10),
        ))
        ev.run()
        ev.flush_pending()
        vo = ev.vo

        # the run must actually exercise the lifecycle machinery:
        assert ev.image_num >= 500
        # keyframe eviction churn (>20 active frames seen, oldest archived)
        assert len(vo.stored_frames) > 50, len(vo.stored_frames)
        # steady state is cap+1: eviction runs before admission, like the
        # reference (deleteKeyframe at visual_odometry.cpp:165-174)
        assert len(vo.active_frames) <= vo.params.num_active_frames + 1
        # landmark archival churn
        assert len(vo.stored_landmarks) > 20, len(vo.stored_landmarks)
        # tracker kept tracking to the end (fresh detections replace lost)
        last_t = max(t for traj in ev.tracker.trajectories.values()
                     for t, _, _ in traj)
        assert last_t >= (DURATION_S - 1.0) * 1e6
        # gradient-slot recycling happened (600 detection frames >> 32
        # slots) without corrupting live state: every pose/landmark finite
        for kf in list(vo.active_frames.values()) + vo.stored_frames:
            assert np.all(np.isfinite(kf.pose))
        for p in vo.map.landmarks.values():
            assert np.all(np.isfinite(p))

        # no drift blow-up. This 24-feature config is far harsher than the
        # reference's 100-feature runs (report Table 3: 0.36-3.5 % of depth
        # on short sequences); measured here: ATE rmse 0.22 m over 598
        # keyframes (11 % of the 2 m scene depth) with re-bootstrap scale
        # resets included. 15 % of depth is the blow-up bound — an ungated
        # run reaches pose norms of ~3e4 and fails it by orders of magnitude.
        assert vo.last_ate is not None
        ate = float(vo.last_ate.rmse)
        assert np.isfinite(ate)
        assert ate < 0.15 * 2.0, f"ATE {ate:.4f} m exceeds 15% of scene depth"
        # the BA/localization sanity gates hold: no pose escaped the map scale
        tr_norms = [np.linalg.norm(kf.pose[4:7])
                    for kf in list(vo.active_frames.values()) + vo.stored_frames]
        assert max(tr_norms) <= vo.params.max_pose_translation
        # final costs stayed sane through slot recycling
        costs = np.asarray([c for _, c, _ in ev.tracker.final_cost_log])
        assert np.all(np.isfinite(costs))
