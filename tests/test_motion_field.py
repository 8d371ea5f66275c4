"""Motion-field compensation tests: velocity sampling from trajectories,
harmonic/TV interpolation with Dirichlet fixed points, event warping,
cost-map debug utility."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu.tracker import align, motion_field as mf
from evo_tpu.tracker import patch_state as ps


class TestVelocitySampling:
    def test_finite_difference_forward_segment(self):
        # reference semantics (feature_detector.cpp:66-90): use the segment
        # starting at the first trajectory sample with t >= t_query
        trajs = {
            1: [(0, 0.0, 20.0), (100_000, 10.0, 20.0), (200_000, 30.0, 20.0)],
            2: [(0, 50.0, 50.0)],  # too short -> skipped
        }
        xy, vel = mf.velocities_from_trajectories(trajs, 50_000)
        assert len(xy) == 1
        # first sample >= 50 ms is the one at 100 ms; its forward segment
        # moves 20 px / 100 ms = 0.2 px/ms
        np.testing.assert_array_equal(xy[0], [10, 20])
        np.testing.assert_allclose(vel[0], [0.2, 0.0], atol=1e-9)

    def test_out_of_range_skipped(self):
        trajs = {1: [(0, 10.0, 20.0), (100, 20.0, 20.0)]}
        xy, vel = mf.velocities_from_trajectories(trajs, 500_000)
        assert len(xy) == 0


class TestInterpolation:
    def test_constant_samples_give_constant_field(self):
        xy = np.array([[10, 10], [50, 30], [100, 60]], np.int32)
        vel = np.full((3, 2), 0.25, np.float32)
        pad_xy = np.zeros((4, 2), np.int32)
        pad_v = np.zeros((4, 2), np.float32)
        pad_xy[:3] = xy
        pad_v[:3] = vel
        field = mf.interpolate_field(
            jnp.asarray(pad_xy), jnp.asarray(pad_v), jnp.asarray(3),
            height=72, width=120,
        )
        np.testing.assert_allclose(np.asarray(field), 0.25, atol=1e-4)

    def test_harmonic_between_two_points(self):
        # two fixed columns with different x-velocities: the harmonic
        # interpolant transitions monotonically between them
        h, w = 64, 64
        xy = np.array([[8, 32], [56, 32]], np.int32)
        vel = np.array([[0.0, 0.0], [1.0, 0.0]], np.float32)
        field = mf.interpolate_field(
            jnp.asarray(xy), jnp.asarray(vel), jnp.asarray(2),
            height=h, width=w, iters=120,
        )
        f = np.asarray(field)[32, :, 0]
        assert f[8] == pytest.approx(0.0, abs=1e-5)
        assert f[56] == pytest.approx(1.0, abs=1e-5)
        mid = f[32]
        assert 0.2 < mid < 0.8
        # monotone along the line between the two fixed points
        assert np.all(np.diff(f[8:57]) > -0.02)

    def test_compensation_sharpens_moving_events(self, rng):
        # uniform translation: with the correct field, warped events collapse
        h = w = 64
        n = 2000
        t_us = np.sort(rng.uniform(0, 100_000, n))
        base_x = rng.choice([10.0, 25.0, 40.0], n)
        x = base_x + 0.2 * (t_us / 1e3)  # 0.2 px/ms
        y = rng.uniform(5, 59, n)
        field = np.zeros((h, w, 2), np.float32)
        field[..., 0] = 0.2
        img = mf.compensate_events_field(field, x, y, t_us, 50_000.0, h, w)
        naive = mf.compensate_events_field(np.zeros_like(field), x, y, t_us, 50_000.0, h, w)
        assert img.max() > naive.max() * 1.5

    def test_full_pipeline_from_tracks(self, rng):
        # tracks moving at 0.1 px/ms feed the field; events warped by it.
        # 3 samples per track so the forward segment from t_mid=50ms exists.
        trajs = {
            i: [
                (0, 10.0 + 15 * i, 20.0 + 10 * i),
                (50_000, 15.0 + 15 * i, 20.0 + 10 * i),
                (100_000, 20.0 + 15 * i, 20.0 + 10 * i),
            ]
            for i in range(4)
        }
        n = 1500
        t_us = np.sort(rng.uniform(0, 100_000, n))
        x = rng.choice([15.0, 30.0, 45.0], n) + 0.1 * (t_us / 1e3)
        y = rng.uniform(10, 54, n)
        field, img = mf.compensate_from_tracks(trajs, x, y, t_us, height=64, width=64)
        active = np.abs(field[..., 0])
        assert np.median(active) == pytest.approx(0.1, abs=0.02)
        assert img.shape == (64, 64)


class TestCostMap:
    def test_cost_map_minimum_near_truth(self, rng):
        """The brute-force cost map has its minimum at the aligned warp."""
        import tests.test_tracker as tt
        from evo_tpu.kernels import gradients

        h, w = 180, 240
        frame = np.zeros((h, w), np.float32)
        frame[80:120, 90:130] = 0.9
        frame = np.asarray(gradients.gaussian_blur(jnp.asarray(frame), 0.7, radius=2))
        grad = jnp.stack(
            gradients.sobel(gradients.log_image(jnp.asarray(frame)), scale=1 / 8),
            axis=0,
        )
        grads = jnp.zeros((ps.GRAD_SLOTS, 2, h, w), jnp.float32).at[0].set(grad)
        table = tt.empty_with_patches(centers=[(90.0, 80.0)])
        table = dataclasses.replace(
            table, flow=jnp.zeros(ps.MAX_PATCHES),
            num_of_events=jnp.full(ps.MAX_PATCHES, 100, jnp.int32),
        )
        # events on the left edge, shifted +3 px in x from the keyframe
        n = 300
        ex = np.round(93.0 + rng.normal(0, 0.8, n)).astype(np.float32)
        ey = np.round(rng.uniform(80, 120, n)).astype(np.float32)
        table = ps.route_events(
            table, jnp.asarray(ex), jnp.asarray(ey),
            jnp.asarray(np.linspace(0, 0.01, n), jnp.float32),
            jnp.asarray(-np.ones(n, np.float32)), jnp.ones(n, bool),
        )
        cm = np.asarray(align.cost_map(table, grads, 0, half_width=5))
        assert cm.shape == (11, 11)
        iy, ix = np.unravel_index(np.argmin(cm), cm.shape)
        # events at +3 => warp translation x should be -3 => offset -3 from
        # center of the map (index 5)
        assert abs((ix - 5) - (-3)) <= 1, (ix, iy, cm.round(2))
