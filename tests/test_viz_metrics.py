"""Visualization + metrics subsystem tests."""

import os
import time

import numpy as np

from evo_tpu.run import metrics, viz


class TestMetrics:
    def test_counters_and_rates(self):
        c = metrics.Counters()
        c.add("events", 500)
        c.add("events", 500)
        assert c.counts["events"] == 1000
        assert c.rate("events") > 0

    def test_timed_blocks(self):
        c = metrics.Counters()
        with c.timed("solve"):
            time.sleep(0.01)
        with c.timed("solve"):
            pass
        s = c.summary()
        assert s["calls_solve"] == 2
        assert s["time_solve_s"] >= 0.01


class TestViz:
    def test_event_image_colors(self):
        rgb = viz.render_event_image(
            np.array([5.0, 10.0]), np.array([3.0, 4.0]), np.array([1, -1]),
            height=16, width=16,
        )
        assert tuple(rgb[3, 5]) == (0, 255, 0)  # positive -> green
        assert tuple(rgb[4, 10]) == (255, 0, 0)  # negative -> red

    def test_overlay_and_patch_views(self, tmp_path):
        from evo_tpu.tracker.detector import EventTracker

        tr = EventTracker()
        img = np.full((180, 240), 0.2, np.float32)
        img[60:100, 80:120] = 0.9
        tr.new_image(0, img)
        rgb = viz.render_feature_overlay(img, tr)
        assert rgb.shape == (180, 240, 3)
        assert (rgb[..., 1] == 255).any()  # rect edges drawn
        paths = viz.save_patch_views(str(tmp_path), tr)
        for p in paths.values():
            assert os.path.exists(p)

    def test_trajectory_plot(self, tmp_path):
        import tests.test_vo as tv
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        world = tv._make_world(rng)
        vo = tv.frontend.VisualOdometryFrontEnd(tv.CALIB)
        intr = jnp.asarray(tv.CALIB.to_array())
        gt_t = np.arange(12, dtype=np.int64) * 50_000
        vo.set_ground_truth(gt_t, np.stack([tv._camera_pose(i) for i in range(12)]))
        for i in range(7):
            vo.new_keyframe_candidate(tv._keyframe_for(i, world, intr, rng))
        out = viz.plot_trajectories(str(tmp_path / "traj.png"), vo)
        if out is not None:  # matplotlib present
            assert os.path.exists(out)

    def test_scene_3d_render(self, tmp_path):
        """3D scene view (frusta + landmarks + GT trail) renders to PNG —
        offline counterpart of `drawScene` (visualizer.cpp:253-315)."""
        import tests.test_vo as tv
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        world = tv._make_world(rng)
        vo = tv.frontend.VisualOdometryFrontEnd(tv.CALIB)
        intr = jnp.asarray(tv.CALIB.to_array())
        gt_t = np.arange(12, dtype=np.int64) * 50_000
        vo.set_ground_truth(gt_t, np.stack([tv._camera_pose(i) for i in range(12)]))
        for i in range(7):
            vo.new_keyframe_candidate(tv._keyframe_for(i, world, intr, rng))
        assert vo.map.landmarks  # scene has live landmarks to draw
        out = viz.render_scene_3d(str(tmp_path / "scene.png"), vo)
        if out is not None:  # matplotlib present
            assert os.path.exists(out) and os.path.getsize(out) > 1000

    def test_frustum_segments_shape(self):
        ident = np.array([1.0, 0, 0, 0, 0.5, -0.25, 2.0])
        segs = viz._frustum_segments(ident, scale=0.1)
        assert len(segs) == 8  # 4 center->corner rays + 4 far-rect edges
        for a, b in segs:
            assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
