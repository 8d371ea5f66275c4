"""Checkpoint/resume: a run interrupted mid-sequence and resumed from a
checkpoint must produce the same final tracker/VO state as an uninterrupted
run."""

import numpy as np

from evo_tpu.io import davis
from evo_tpu.run import checkpoint
from evo_tpu.run.evaluator import Evaluator, EvaluatorParams
from tests.test_run import square_dataset  # noqa: F401  (fixture reuse)


def _params(tmp):
    return EvaluatorParams(output_dir=str(tmp), run_compensation=False)


def test_resume_matches_uninterrupted(square_dataset, tmp_path):  # noqa: F811
    ds = davis.Davis240cDataset(square_dataset)

    # uninterrupted run over 6 frames
    ev_full = Evaluator(ds, _params(tmp_path))
    ev_full.run(max_frames=6)

    # run 3 frames, checkpoint, restore into a fresh pipeline, run the rest
    ev_a = Evaluator(ds, _params(tmp_path))
    ev_a.run(max_frames=3)
    path = checkpoint.save_checkpoint(str(tmp_path / "ckpt"), ev_a)

    ev_b = checkpoint.load_checkpoint(path, ds, _params(tmp_path))
    assert ev_b.image_num == 3
    ev_b.run(max_frames=6, start_frame=ev_b.image_num)

    # tracker state matches bitwise-ish
    np.testing.assert_allclose(
        np.asarray(ev_b.tracker.table.center),
        np.asarray(ev_full.tracker.table.center),
        atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(ev_b.tracker.table.track_id),
        np.asarray(ev_full.tracker.table.track_id),
    )
    assert ev_b.tracker.next_track_id == ev_full.tracker.next_track_id
    # trajectories identical
    assert set(ev_b.tracker.trajectories) == set(ev_full.tracker.trajectories)
    for tid in ev_full.tracker.trajectories:
        a = np.asarray(ev_full.tracker.trajectories[tid])
        b = np.asarray(ev_b.tracker.trajectories[tid])
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_checkpoint_roundtrip_preserves_vo(square_dataset, tmp_path):  # noqa: F811
    ds = davis.Davis240cDataset(square_dataset)
    ev = Evaluator(ds, _params(tmp_path))
    ev.run(max_frames=5)
    path = checkpoint.save_checkpoint(str(tmp_path / "c2"), ev)
    ev2 = checkpoint.load_checkpoint(path, ds, _params(tmp_path))
    assert set(ev2.vo.active_frames) == set(ev.vo.active_frames)
    assert set(ev2.vo.map.landmarks) == set(ev.vo.map.landmarks)
    for t in ev.vo.active_frames:
        np.testing.assert_allclose(
            ev2.vo.active_frames[t].pose, ev.vo.active_frames[t].pose
        )
