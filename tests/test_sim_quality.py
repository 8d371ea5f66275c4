"""Simulator + end-to-end quality tests.

The round-trip that matters: simulate a 6-DoF sequence with exact GT, run
the full pipeline on it, and score against the reference's headline metrics
(BASELINE.md): tracker mean distance error and Sim3-aligned ATE.
"""

import numpy as np
import pytest

from evo_tpu.io import davis
from evo_tpu.io.sim import EventCameraSimulator, SimParams, write_dataset
from evo_tpu.run.evaluator import Evaluator, EvaluatorParams
from evo_tpu.run.quality import evaluate_tracker


@pytest.fixture(scope="module")
def sim_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("sim")
    sim = EventCameraSimulator(SimParams(duration_s=0.6, fps=20, substeps=6))
    out = sim.generate()
    write_dataset(str(root), out)
    return str(root)


class TestSimulator:
    def test_dataset_roundtrip(self, sim_dataset):
        ds = davis.Davis240cDataset(sim_dataset)
        assert len(ds.events) > 20_000
        assert ds.num_images == 12
        assert len(ds.gt_t_us) == 12
        assert bool(np.all(np.diff(ds.events.t_us) >= 0))
        # polarity roughly balanced on an oscillating trajectory
        frac_pos = (ds.events.p > 0).mean()
        assert 0.3 < frac_pos < 0.7

    def test_events_consistent_with_frames(self, sim_dataset):
        """Event counts concentrate where the image actually changed."""
        ds = davis.Davis240cDataset(sim_dataset)
        f0 = ds.image(0)
        f5 = ds.image(5)
        dlog = np.abs(np.log(f0 + 0.1) - np.log(f5 + 0.1))
        sel = (ds.events.t_us >= ds.image_t_us[0]) & (ds.events.t_us < ds.image_t_us[5])
        counts = np.zeros_like(f0)
        np.add.at(counts, (ds.events.y[sel], ds.events.x[sel]), 1)
        # pixels with many events should have changed more than quiet pixels
        busy = counts >= np.percentile(counts, 99)
        quiet = counts == 0
        assert dlog[busy].mean() > 2.0 * dlog[quiet].mean()


class TestEndToEndQuality:
    def test_tracker_error_beats_reference(self, sim_dataset, tmp_path):
        """Full pipeline on the simulated sequence: tracker mean distance
        error must be <= the reference's published 1.67 px (shapes_6dof,
        report Table 1), and the live ATE must be a small fraction of the
        scene depth (reference Table 3: 0.36%-3.5%)."""
        ds = davis.Davis240cDataset(sim_dataset)
        ev = Evaluator(
            ds, EvaluatorParams(output_dir=str(tmp_path), run_compensation=False)
        )
        ev.run()
        q = evaluate_tracker(
            ev.tracker.trajectories, ds.gt_t_us, ds.gt_poses, ds.calib,
            plane_depth=2.0,
        )
        assert q.num_tracks > 30
        assert q.mean_distance_error_px < 1.67, q
        assert q.mean_feature_age_s > 0.2
        if ev.vo is not None and ev.vo.last_ate is not None:
            # ATE relative to max scene depth (plane at 2 m)
            assert ev.vo.last_ate.rmse / 2.0 < 0.035, ev.vo.last_ate


def test_death_breakdown_attribution():
    """Track-end cause attribution (VERDICT r4 item 5): censored at
    sequence end, border exit, interior loss, and too-short tracks."""
    from evo_tpu.run.quality import death_breakdown

    us = 1_000_000
    trajs = {
        0: [(0, 100.0, 90.0), (1 * us, 101.0, 90.0), (6 * us, 102.0, 90.0)],
        1: [(0, 100.0, 90.0), (1 * us, 150.0, 90.0), (3 * us, 236.0, 90.0)],
        2: [(0, 100.0, 90.0), (1 * us, 101.0, 90.0), (3 * us, 102.0, 91.0)],
        3: [(0, 50.0, 50.0)],
    }
    out = death_breakdown(trajs, height=180, width=240)
    assert out["censored"] == 1  # track 0 alive at the 6 s end
    assert out["border"] == 1    # track 1 died at x=236 (within 8 px of 240)
    assert out["interior_lost"] == 1  # track 2 died in-frame at 3 s
    assert out["short"] == 1
    assert out["interior_lost_mean_age_s"] == 3.0
    assert death_breakdown({}) == {}


def test_vectorized_scorer_matches_scalar_oracle():
    """The batched evaluate_tracker (one jit call for all points) must
    reproduce the per-point scalar algorithm exactly: same track set, same
    per-track means, same ages, same out-of-range/behind-camera skips."""
    import jax.numpy as jnp

    from evo_tpu.core import camera, lie
    from evo_tpu.core.types import CalibParams
    from evo_tpu.io.replay import interpolate_gt, interpolate_gt_batch
    from evo_tpu.run import quality

    rng = np.random.default_rng(0)
    calib = CalibParams(fx=199.0, fy=198.0, cx=119.5, cy=89.5,
                        width=240, height=180)
    intr = jnp.asarray(calib.to_array())
    gt_t = (np.arange(0, 41) * 50_000).astype(np.int64)
    gt_p = np.zeros((41, 7))
    gt_p[:, 0] = 1.0
    gt_p[:, 4] = 0.1 * np.sin(np.arange(41) * 0.3)
    gt_p[:, 5] = 0.05 * np.cos(np.arange(41) * 0.2)

    # batch GT interpolation == scalar (incl. exact hits and boundaries)
    ts = rng.integers(0, 2_000_000, 200)
    bp, ok = interpolate_gt_batch(gt_t, gt_p, ts)
    for i in range(0, 200, 23):
        sp = interpolate_gt(gt_t, gt_p, int(ts[i]))
        assert ok[i] and sp is not None
        np.testing.assert_allclose(bp[i], sp, atol=1e-5)
    for t in (int(gt_t[0]), int(gt_t[-1]), int(gt_t[7])):
        b, _ = interpolate_gt_batch(gt_t, gt_p, np.array([t]))
        np.testing.assert_allclose(b[0], interpolate_gt(gt_t, gt_p, t),
                                   atol=1e-6)
    assert not interpolate_gt_batch(gt_t, gt_p,
                                    np.array([-5, 2_000_001]))[1].any()

    trajs = {}
    for tid in range(25):
        t0 = int(rng.integers(0, 1_000_000))
        n = int(rng.integers(3, 20))
        tsr = np.sort(rng.integers(t0, 2_000_000, n))
        xs = rng.uniform(20, 220, n)
        ys = rng.uniform(20, 160, n)
        trajs[tid] = [(int(t), float(x), float(y))
                      for t, x, y in zip(tsr, xs, ys)]
    q = quality.evaluate_tracker(trajs, gt_t, gt_p, calib,
                                 plane_depth=2.0, scene="3walls")

    errors, ages = {}, []
    for tid, traj in trajs.items():
        if len(traj) < 3:
            continue
        t0, x0, y0 = traj[0]
        pose0 = interpolate_gt(gt_t, gt_p, int(t0))
        if pose0 is None:
            continue
        w = quality._raycast_plane(pose0, intr, np.array([x0, y0]),
                                   2.0, "3walls")
        errs = []
        for t_us, x, y in traj[1:]:
            pose = interpolate_gt(gt_t, gt_p, int(t_us))
            if pose is None:
                continue
            p_c = np.asarray(lie.se3_apply(
                lie.se3_inverse(jnp.asarray(pose, jnp.float32)),
                jnp.asarray(w, jnp.float32)))
            if p_c[2] <= 0.1:
                continue
            tp = np.asarray(camera.project(intr, jnp.asarray(p_c)))
            errs.append(float(np.hypot(tp[0] - x, tp[1] - y)))
        if errs:
            errors[tid] = float(np.mean(errs))
            ages.append((traj[-1][0] - traj[0][0]) / 1e6)

    assert set(q.per_track_error) == set(errors)
    for tid in errors:
        np.testing.assert_allclose(q.per_track_error[tid], errors[tid],
                                   rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(q.mean_feature_age_s, np.mean(ages),
                               atol=1e-9)
