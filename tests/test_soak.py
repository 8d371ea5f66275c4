"""Long-sequence lifecycle soak (SURVEY §7 hard part 6 / configs[3] analogue).

30 s of simulated stream at 20 fps — 600 frames, far beyond the 20-keyframe
window and the 128 gradient slots — so the run churns through keyframe
eviction, landmark archival, patch death/rebirth, and gradient-slot
recycling. Asserts the whole pipeline stays numerically sane and the
Sim3-aligned trajectory error does not blow up relative to the short-run
level (tests/test_sim_quality.py).

The simulated dataset is generated once and cached under /tmp keyed by its
parameters; re-runs of the suite skip the ~1 min generation.
"""

import os

import numpy as np
import pytest

from evo_tpu.io import davis, sim
from evo_tpu.run.evaluator import Evaluator, EvaluatorParams

DURATION_S = 30.0
FPS = 20.0
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
        ))
        ev.run()
        ev.flush_pending()
        vo = ev.vo

        # the run must actually exercise the lifecycle machinery:
        assert ev.image_num >= 500
        # keyframe eviction churn (>20 active frames seen, oldest archived)
        assert len(vo.stored_frames) > 50, len(vo.stored_frames)
        assert len(vo.active_frames) <= vo.params.num_active_frames
        # landmark archival churn
        assert len(vo.stored_landmarks) > 20, len(vo.stored_landmarks)
        # tracker kept tracking to the end (fresh detections replace lost)
        last_t = max(t for traj in ev.tracker.trajectories.values()
                     for t, _, _ in traj)
        assert last_t >= (DURATION_S - 1.0) * 1e6
        # gradient-slot recycling happened (600 detection frames >> 128
        # slots) without corrupting live state: every pose/landmark finite
        for kf in list(vo.active_frames.values()) + vo.stored_frames:
            assert np.all(np.isfinite(kf.pose))
        for p in vo.map.landmarks.values():
            assert np.all(np.isfinite(p))

        # no drift blow-up: the live Sim3-aligned ATE at the end of 30 s
        # stays within the same order as the 1 s quality run (~0.33 % of the
        # 2 m scene depth); 5 % of depth is the blow-up threshold.
        assert vo.last_ate is not None
        ate = float(vo.last_ate.rmse)
        assert np.isfinite(ate)
        assert ate < 0.05 * 2.0, f"ATE {ate:.4f} m exceeds 5% of scene depth"
        # final costs stayed sane through slot recycling
        costs = np.asarray([c for _, c, _ in ev.tracker.final_cost_log])
        assert np.all(np.isfinite(costs))
