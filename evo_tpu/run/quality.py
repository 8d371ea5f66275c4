"""Quality evaluation against simulator ground truth.

Computes the reference report's headline quality metrics (report.pdf §4,
Tables 1-3; see BASELINE.md) on a simulated dataset where exact ground truth
is available:

- **tracker mean distance error** [px]: each track's estimated positions vs
  the true projection of its 3D feature point (obtained by raycasting the
  track's birth observation onto the simulator's plane through the GT pose);
- **feature age** [s]: track lifetime;
- **ATE** [m]: from the VO frontend's live Sim3-aligned metric.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from evo_tpu.core import camera, lie
from evo_tpu.io.replay import interpolate_gt


@dataclasses.dataclass
class TrackerQuality:
    mean_distance_error_px: float
    median_distance_error_px: float
    mean_feature_age_s: float
    num_tracks: int
    per_track_error: dict


def _raycast_plane(pose_w_c, intr, pix, plane_depth: float):
    """World point where the pixel's ray meets the z=plane_depth plane."""
    bear_c = np.asarray(camera.unproject(intr, jnp.asarray(pix, jnp.float32)))
    R = np.asarray(lie.quat_to_matrix(jnp.asarray(pose_w_c[0:4], jnp.float32)))
    o = pose_w_c[4:7]
    d = R @ bear_c
    t = (plane_depth - o[2]) / d[2]
    return o + t * d


def evaluate_tracker(trajectories: dict, gt_t_us: np.ndarray,
                     gt_poses: np.ndarray, calib, plane_depth: float,
                     min_points: int = 3) -> TrackerQuality:
    """Score feature tracks against plane-raycast ground truth."""
    intr = jnp.asarray(calib.to_array())
    errors = {}
    ages = []
    for tid, traj in trajectories.items():
        if len(traj) < min_points:
            continue
        t0, x0, y0 = traj[0]
        pose0 = interpolate_gt(gt_t_us, gt_poses, int(t0))
        if pose0 is None:
            continue
        w = _raycast_plane(pose0, intr, np.array([x0, y0]), plane_depth)
        errs = []
        for t_us, x, y in traj[1:]:
            pose = interpolate_gt(gt_t_us, gt_poses, int(t_us))
            if pose is None:
                continue
            p_c = np.asarray(
                lie.se3_apply(
                    lie.se3_inverse(jnp.asarray(pose, jnp.float32)),
                    jnp.asarray(w, jnp.float32),
                )
            )
            if p_c[2] <= 0.1:
                continue
            true_pix = np.asarray(camera.project(intr, jnp.asarray(p_c)))
            errs.append(float(np.hypot(true_pix[0] - x, true_pix[1] - y)))
        if errs:
            errors[tid] = float(np.mean(errs))
            ages.append((traj[-1][0] - traj[0][0]) / 1e6)
    if not errors:
        return TrackerQuality(np.nan, np.nan, 0.0, 0, {})
    vals = np.asarray(list(errors.values()))
    return TrackerQuality(
        mean_distance_error_px=float(vals.mean()),
        median_distance_error_px=float(np.median(vals)),
        mean_feature_age_s=float(np.mean(ages)),
        num_tracks=len(errors),
        per_track_error=errors,
    )
