"""Run-layer tests: artifact format round-trips (the evaluator_test.cpp
pattern) and the evaluator pipeline on a tiny synthetic dataset."""

import os

import numpy as np
import pytest

from evo_tpu.io import davis
from evo_tpu.run import artifacts
from evo_tpu.run.evaluator import Evaluator, EvaluatorParams


class TestArtifacts:
    def test_trajectory_roundtrip(self, tmp_path):
        # write in evaluator format, re-ingest with the dataset reader
        # (the reference's trajectory.txt -> getTrajectory round trip)
        trajs = {
            3: [(1_000_000, 10.5, 20.25), (1_050_000, 11.0, 21.0)],
            7: [(1_000_000, 100.0, 50.0)],
        }
        path = artifacts.save_features_trajectory(str(tmp_path), trajs)
        assert path.endswith("trajectory.txt")
        parsed = davis.parse_trajectory(path)
        assert set(parsed) == {3, 7}
        t_us, xy = parsed[3]
        np.testing.assert_array_equal(t_us, [1_000_000, 1_050_000])
        np.testing.assert_allclose(xy, [[10.5, 20.25], [11.0, 21.0]])

    def test_pose_format(self, tmp_path):
        import jax.numpy as jnp

        from evo_tpu.core import lie

        pose = np.asarray(lie.se3_exp(jnp.asarray([0.1, 0.2, 0.3, 0.0, 0.0, 0.0])))
        path = artifacts.save_poses(str(tmp_path), [pose])
        rows = np.loadtxt(path)
        assert rows.shape == (12,)
        m = rows.reshape(3, 4)
        np.testing.assert_allclose(m[:, 3], [0.1, 0.2, 0.3], atol=1e-5)
        np.testing.assert_allclose(m[:, :3], np.eye(3), atol=1e-5)

    def test_final_costs(self, tmp_path):
        path = artifacts.save_final_costs(str(tmp_path), [(1, 0.25, 123456)])
        line = open(path).read().strip()
        assert line == "1 0.25000000 123456"


@pytest.fixture(scope="module")
def square_dataset(tmp_path_factory):
    """Small moving-square dataset (events on the two vertical edges)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("sq")
    rng = np.random.default_rng(5)
    H, W, vel = 180, 240, 100.0
    events = []
    for t in np.arange(0.0, 0.3, 2e-4):
        xl = 60 + vel * t
        xr = xl + 40
        for y in range(60, 121, 3):
            events.append((t + rng.uniform(0, 1e-4), xl + rng.normal(0, 0.3), y, 0))
            events.append((t + rng.uniform(0, 1e-4), xr + rng.normal(0, 0.3), y, 1))
    events.sort()
    with open(root / "events.txt", "w") as f:
        for t, x, y, p in events:
            if 0 <= x < W:
                f.write(f"{t:.9f} {int(round(x))} {int(y)} {p}\n")
    os.makedirs(root / "images", exist_ok=True)
    lines = []
    for i, t in enumerate(np.arange(0.0, 0.3, 0.05)):
        img = np.full((H, W), 40, np.uint8)
        xl = int(60 + vel * t)
        img[60:121, max(xl, 0):min(xl + 40, W)] = 200
        name = f"images/f{i:04d}.png"
        Image.fromarray(img, "L").save(root / name)
        lines.append(f"{t:.6f} {name}\n")
    (root / "images.txt").write_text("".join(lines))
    (root / "calib.txt").write_text("199.0 198.0 132.0 110.0 0 0 0 0 0\n")
    return str(root)


class TestEvaluator:
    def test_pipeline_produces_tracks(self, square_dataset, tmp_path):
        ds = davis.Davis240cDataset(square_dataset)
        params = EvaluatorParams(output_dir=str(tmp_path), run_compensation=False)
        ev = Evaluator(ds, params)
        ev.run(max_frames=6)
        paths = ev.finish()
        assert os.path.exists(paths["trajectory"])
        parsed = davis.parse_trajectory(paths["trajectory"])
        assert len(parsed) >= 4
        # at least one long track must move with ~the square's velocity
        vels = []
        for tid, (t_us, xy) in parsed.items():
            if t_us[-1] - t_us[0] > 150_000:
                v = (xy[-1, 0] - xy[0, 0]) / ((t_us[-1] - t_us[0]) / 1e6)
                vels.append(v)
        assert len(vels) >= 1
        assert max(vels) == pytest.approx(100.0, abs=15.0), vels

    def test_pipelined_matches_sync(self, square_dataset, tmp_path):
        """The pipelined drive (one sync pull per window, deferred VO /
        logs / compensation readback) must produce identical artifacts to
        the stepwise path — VO and the compensated image are pure consumers
        of tracker state, so deferring them one window changes nothing."""
        from evo_tpu.tracker.compensate import CompensateParams

        outs = {}
        # depth2 forces the mid-stream batched consume (consume_frames packs
        # several windows into one fetch) within this short sequence; depth8
        # (the default) drains only at flush — both must match sync exactly
        for name, pipe, depth in (
            ("sync", False, 8), ("pipe", True, 8), ("depth2", True, 2),
        ):
            d = tmp_path / name
            d.mkdir()
            ds = davis.Davis240cDataset(square_dataset)
            params = EvaluatorParams(
                output_dir=str(d), pipelined=pipe, pipeline_depth=depth,
                compensation_events=4000,
                compensate=CompensateParams(max_iters=4, events_per_tile_cap=512),
            )
            ev = Evaluator(ds, params)
            ev.run(max_frames=5)
            outs[name] = (ev, ev.finish())
        t_sync = davis.parse_trajectory(outs["sync"][1]["trajectory"])
        v_s = np.loadtxt(outs["sync"][1]["vo_trajectory"])
        for name in ("pipe", "depth2"):
            t_pipe = davis.parse_trajectory(outs[name][1]["trajectory"])
            assert set(t_sync) == set(t_pipe)
            for tid in t_sync:
                np.testing.assert_array_equal(t_sync[tid][0], t_pipe[tid][0])
                np.testing.assert_allclose(
                    t_sync[tid][1], t_pipe[tid][1], atol=1e-4
                )
            np.testing.assert_allclose(
                outs[name][0].motion_field, outs["sync"][0].motion_field,
                atol=1e-5,
            )
            v_p = np.loadtxt(outs[name][1]["vo_trajectory"])
            np.testing.assert_allclose(v_p, v_s, atol=1e-4)

    def test_compensation_runs(self, square_dataset, tmp_path):
        from evo_tpu.tracker.compensate import CompensateParams

        ds = davis.Davis240cDataset(square_dataset)
        params = EvaluatorParams(
            output_dir=str(tmp_path),
            compensation_events=4000,
            compensate=CompensateParams(max_iters=8, events_per_tile_cap=512),
        )
        ev = Evaluator(ds, params)
        ev.run(max_frames=3)
        assert ev.compensated_image is not None
        assert ev.motion_field is not None
        assert ev.compensated_image.shape == (180, 240)

    def test_tracker_experiment_freezes_detection(self, square_dataset, tmp_path):
        ds = davis.Davis240cDataset(square_dataset)
        params = EvaluatorParams(
            output_dir=str(tmp_path), tracker_experiment=True, run_compensation=False
        )
        ev = Evaluator(ds, params)
        ev.run(max_frames=5)
        # no detections after frame 2: next_track_id frozen at frame-2 count
        n_after_2 = ev.tracker.next_track_id
        assert ev.image_num == 5
        assert ev.tracker.num_images == 2  # frozen
        assert n_after_2 > 0
