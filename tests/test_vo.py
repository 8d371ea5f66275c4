"""VO backend tests: Sim3 alignment, bundle adjustment recovery, and the
full keyframe policy on a synthetic scene with ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu.core import camera, lie
from evo_tpu.core.types import CalibParams
from evo_tpu.vo import align_sim3, ba, frontend
from evo_tpu.vo.keyframe import Keyframe

CALIB = CalibParams(fx=199.0, fy=198.0, cx=132.0, cy=110.0)


class TestSim3Align:
    def test_recovers_known_transform(self, rng):
        model = rng.standard_normal((40, 3))
        s_true = 1.8
        q = lie.so3_exp(jnp.asarray(rng.standard_normal(3) * 0.5, jnp.float32))
        R = np.asarray(lie.quat_to_matrix(q), np.float64)
        t_true = np.array([0.3, -0.5, 1.0])
        data = s_true * model @ R.T + t_true
        sim, metric = align_sim3.align_points_sim3(data, model)
        assert sim[0] == pytest.approx(s_true, abs=1e-3)
        np.testing.assert_allclose(sim[5:8], t_true, atol=1e-3)
        assert metric.rmse < 1e-3
        assert metric.count == 40

    def test_ate_on_noisy_data(self, rng):
        model = rng.standard_normal((30, 3))
        data = 2.0 * model + rng.standard_normal((30, 3)) * 0.01
        _, metric = align_sim3.align_points_sim3(data, model)
        assert 0 < metric.rmse < 0.05
        assert metric.min <= metric.mean <= metric.max


def _synthetic_ba_problem(rng, F=6, L=40, noise_px=0.0):
    intr = jnp.asarray(CALIB.to_array())
    # cameras on an arc looking at a point cloud around z~6
    poses = []
    for i in range(F):
        xi = jnp.asarray(
            np.array([0.4 * i, 0.02 * i, 0.01 * i, 0.0, 0.05 * i, 0.0]), jnp.float32
        )
        poses.append(lie.se3_exp(xi))
    poses = jnp.stack(poses)  # T_w_c
    pts = jnp.asarray(
        np.stack(
            [rng.uniform(-2, 3.5, L), rng.uniform(-1.5, 1.5, L), rng.uniform(5, 9, L)],
            axis=-1,
        ),
        jnp.float32,
    )
    obs_f, obs_l, obs_p = [], [], []
    for f in range(F):
        p_cam = lie.se3_apply(lie.se3_inverse(poses[f]), pts)
        pix = np.asarray(camera.project(intr, p_cam))
        ok = (
            (np.asarray(p_cam[:, 2]) > 0.5)
            & (pix[:, 0] > 5) & (pix[:, 0] < 235)
            & (pix[:, 1] > 5) & (pix[:, 1] < 175)
        )
        for l in np.flatnonzero(ok):
            obs_f.append(f)
            obs_l.append(int(l))
            obs_p.append(pix[l] + rng.normal(0, noise_px, 2))
    return intr, poses, pts, (
        np.array(obs_f, np.int32), np.array(obs_l, np.int32),
        np.array(obs_p, np.float32),
    )


class TestBA:
    def test_recovers_perturbed_geometry(self, rng):
        intr, poses_true, pts_true, (of, ol, op) = _synthetic_ba_problem(rng)
        F, L, O = poses_true.shape[0], pts_true.shape[0], len(of)
        # perturb everything except the first two (gauge) poses
        pert = np.asarray(poses_true).copy()
        for f in range(2, F):
            xi = rng.standard_normal(6) * np.array([0.05] * 3 + [0.01] * 3)
            pert[f] = np.asarray(
                lie.se3_retract(jnp.asarray(pert[f]), jnp.asarray(xi, jnp.float32))
            )
        pts_pert = np.asarray(pts_true) + rng.standard_normal((L, 3)) * 0.08

        fixed = np.zeros(F, bool)
        fixed[:2] = True
        poses_out, lms_out, cost, cost0, _ = ba.ba_solve(
            jnp.asarray(pert), jnp.asarray(pts_pert, jnp.float32), intr,
            jnp.asarray(of), jnp.asarray(ol), jnp.asarray(op),
            jnp.ones(O, bool), jnp.asarray(fixed), num_iters=30,
        )
        assert float(cost) < float(cost0) * 1e-3
        # pose error collapses
        for f in range(F):
            d = lie.se3_log(
                lie.se3_compose(lie.se3_inverse(poses_out[f]), poses_true[f])
            )
            assert float(jnp.linalg.norm(d)) < 5e-3, f
        np.testing.assert_allclose(np.asarray(lms_out), np.asarray(pts_true), atol=2e-2)

    def test_fixed_poses_stay_fixed(self, rng):
        intr, poses_true, pts_true, (of, ol, op) = _synthetic_ba_problem(rng)
        F = poses_true.shape[0]
        fixed = np.zeros(F, bool)
        fixed[:2] = True
        poses_out, _, _, _, _ = ba.ba_solve(
            poses_true, pts_true, intr,
            jnp.asarray(of), jnp.asarray(ol), jnp.asarray(op),
            jnp.ones(len(of), bool), jnp.asarray(fixed), num_iters=5,
        )
        np.testing.assert_allclose(
            np.asarray(poses_out[:2]), np.asarray(poses_true[:2]), atol=1e-7
        )

    def test_masked_observations_ignored(self, rng):
        intr, poses_true, pts_true, (of, ol, op) = _synthetic_ba_problem(rng)
        O = len(of)
        # corrupt half the observations but mask them out
        op_bad = op.copy()
        op_bad[::2] += 40.0
        mask = np.ones(O, bool)
        mask[::2] = False
        fixed = np.zeros(poses_true.shape[0], bool)
        fixed[:2] = True
        _, _, cost, _, _ = ba.ba_solve(
            poses_true, pts_true, intr,
            jnp.asarray(of), jnp.asarray(ol), jnp.asarray(op_bad),
            jnp.asarray(mask), jnp.asarray(fixed), num_iters=3,
        )
        assert float(cost) < 1e-4  # masked corruption contributes nothing


def _make_world(rng, n_pts=120):
    return np.stack(
        [rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(5, 10, n_pts)],
        axis=-1,
    )


def _camera_pose(i):
    """Ground-truth trajectory: translate along x with slight rotation."""
    xi = np.array([0.25 * i, 0.01 * i, 0.002 * i, 0.0, 0.01 * i, 0.0], np.float32)
    return np.asarray(lie.se3_exp(jnp.asarray(xi)), np.float64)


def _keyframe_for(i, world, intr, rng, noise_px=0.3):
    pose = _camera_pose(i)
    p_cam = np.asarray(
        lie.se3_apply(lie.se3_inverse(jnp.asarray(pose, jnp.float32)), jnp.asarray(world, jnp.float32))
    )
    pix = np.asarray(camera.project(intr, jnp.asarray(p_cam, jnp.float32)))
    lms = {}
    for t in range(len(world)):
        x, y = pix[t]
        if p_cam[t, 2] > 0.5 and 8 < x < 232 and 8 < y < 172:
            lms[t] = pix[t] + rng.normal(0, noise_px, 2)
    return Keyframe(t_us=i * 50_000, landmarks=lms)


class TestFrontend:
    def test_full_vo_pipeline_matches_gt(self, rng):
        """Feed synthetic keyframes from a known trajectory; after N frames
        the Sim3-aligned ATE against GT must be small — the reference logs
        exactly this metric per keyframe (visual_odometry.cpp:78-97)."""
        world = _make_world(rng)
        vo = frontend.VisualOdometryFrontEnd(CALIB)
        intr = jnp.asarray(CALIB.to_array())
        gt_t = np.arange(12, dtype=np.int64) * 50_000
        gt_poses = np.stack([_camera_pose(i) for i in range(12)])
        vo.set_ground_truth(gt_t, gt_poses)

        for i in range(10):
            kf = _keyframe_for(i, world, intr, rng)
            vo.new_keyframe_candidate(kf)

        # one early frame may legitimately be skipped (low-parallax bootstrap
        # fails until the baseline grows — the reference's retry policy)
        assert len(vo.active_frames) >= 9
        assert len(vo.map.landmarks) > 50
        assert vo.last_ate is not None
        # translation scale is ~0.25/frame; ATE after alignment must be tiny
        assert vo.last_ate.rmse < 0.05, vo.last_ate

    def test_keyframe_eviction(self, rng):
        world = _make_world(rng)
        p = frontend.VoParams(num_active_frames=5)
        vo = frontend.VisualOdometryFrontEnd(CALIB, p)
        intr = jnp.asarray(CALIB.to_array())
        for i in range(9):
            vo.new_keyframe_candidate(_keyframe_for(i, world, intr, rng))
        assert len(vo.active_frames) <= 6
        assert len(vo.stored_frames) >= 2

    def test_relocalization_after_low_inliers(self, rng):
        """A keyframe with almost no landmarks must not corrupt the map: the
        reuse-last-pose fallback (maxNumWithoutAdd) handles it."""
        world = _make_world(rng)
        vo = frontend.VisualOdometryFrontEnd(CALIB)
        intr = jnp.asarray(CALIB.to_array())
        for i in range(4):
            vo.new_keyframe_candidate(_keyframe_for(i, world, intr, rng))
        # degenerate keyframe: 3 landmarks only
        kf = _keyframe_for(4, world, intr, rng)
        kf.landmarks = dict(list(kf.landmarks.items())[:3])
        vo.new_keyframe_candidate(kf)
        # pipeline continues fine afterwards
        ok = vo.new_keyframe_candidate(_keyframe_for(5, world, intr, rng))
        assert ok
