"""Sim(3) trajectory alignment (Umeyama/Arun SVD) and ATE metrics.

Counterpart of the reference's aligner (`implementation/visual_odometry/
src/aligner.cpp:27-114`): centroid + SVD rotation with reflection guard +
non-symmetric scale + translation, filling rmse/mean/min/max/count of the
translational errors.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from evo_tpu.core import lie


@dataclasses.dataclass
class ErrorMetric:
    """ATE statistics (`aligner.h:ErrorMetricValue`)."""

    rmse: float = 0.0
    mean: float = 0.0
    min: float = 0.0
    max: float = 0.0
    count: int = 0


@jax.jit
def _align_points_sim3_jit(data, model):
    """data, model: [N, 3]. Returns (s, R [3,3], t [3]) such that
    data ≈ s·R·model + t (aligner.cpp:27-88)."""
    cd = jnp.mean(data, axis=0)
    cm = jnp.mean(model, axis=0)
    dc = data - cd
    mc = model - cm
    W = dc.T @ mc  # [3,3]
    u, _, vt = jnp.linalg.svd(W)
    d = jnp.linalg.det(u) * jnp.linalg.det(vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(jnp.where(d < 0, -1.0, 1.0))
    R = u @ S @ vt
    rotated = mc @ R.T
    dots = jnp.sum(dc * rotated)
    norms = jnp.sum(mc * mc)
    s = dots / jnp.maximum(norms, 1e-12)
    t = cd - s * (R @ cm)
    # quaternion extracted inside the same jit: the eager quat_from_matrix
    # call cost a handful of ~1 ms micro-dispatches per keyframe
    return s, R, t, lie.quat_from_matrix(R)


def align_points_sim3(data: np.ndarray, model: np.ndarray):
    """Returns (sim3 [8] mapping model→data, ErrorMetric)."""
    s, R, t, q = _align_points_sim3_jit(
        jnp.asarray(data, jnp.float32), jnp.asarray(model, jnp.float32)
    )
    s, R, t = float(s), np.asarray(R, np.float64), np.asarray(t, np.float64)
    q = np.asarray(q, np.float64)
    sim = np.concatenate([[s], q, t])
    aligned = (s * (model @ R.T)) + t
    errors = np.linalg.norm(data - aligned, axis=-1)
    metric = ErrorMetric(
        rmse=float(np.sqrt(np.mean(errors**2))),
        mean=float(np.mean(errors)),
        min=float(np.min(errors)),
        max=float(np.max(errors)),
        count=len(errors),
    )
    return sim, metric


def align_trajectories_sim3(reference_poses: list[np.ndarray], camera_poses: list[np.ndarray]):
    """Align camera-center trajectories (the reference's
    `align_cameras_sim3`, aligner.cpp:95-114): reference_poses (GT) and
    camera_poses as SE3 [7] arrays; alignment maps camera centers onto GT
    centers. Returns (sim3 [8], ErrorMetric)."""
    ref = np.stack([p[4:7] for p in reference_poses])
    cam = np.stack([p[4:7] for p in camera_poses])
    return align_points_sim3(ref, cam)
