"""Artifact writers — byte-compatible with the reference's outputs so the
same external evaluators (uzh-rpg feature-tracking eval, trajectory
comparison) consume both:

- ``trajectory.txt``: ``track_id t_sec x y`` rows, 8 decimals
  (`evaluator.cpp:125-150`);
- ``vo_trajectory.txt``: 12 values per row — the flattened 3x4 pose matrix
  (`evaluator.cpp:152-177`);
- ``final_cost.txt``: ``track_id cost t_us`` (`evaluator.cpp:209-225`).
"""

from __future__ import annotations

import os

import numpy as np

from evo_tpu.core import lie


def save_features_trajectory(path_or_dir: str, trajectories: dict) -> str:
    """trajectories: track_id -> list of (t_us, x, y)."""
    path = _resolve(path_or_dir, "trajectory.txt")
    with open(path, "w") as f:
        for tid in sorted(trajectories):
            for t_us, x, y in trajectories[tid]:
                f.write(f"{tid} {t_us / 1e6:.8f} {x:.8f} {y:.8f}\n")
    return path


def save_poses(path_or_dir: str, poses) -> str:
    """poses: iterable of SE3 [7] arrays (qw qx qy qz tx ty tz)."""
    import jax.numpy as jnp

    path = _resolve(path_or_dir, "vo_trajectory.txt")
    with open(path, "w") as f:
        for pose in poses:
            m = np.asarray(lie.se3_to_matrix(jnp.asarray(pose, jnp.float32)))
            row = m[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.8f}" for v in row) + "\n")
    return path


def save_final_costs(path_or_dir: str, costs) -> str:
    """costs: iterable of (track_id, cost, t_us)."""
    path = _resolve(path_or_dir, "final_cost.txt")
    with open(path, "w") as f:
        for tid, cost, t_us in costs:
            f.write(f"{tid} {cost:.8f} {t_us}\n")
    return path


def _resolve(path_or_dir: str, name: str) -> str:
    root, ext = os.path.splitext(path_or_dir)
    if ext == ".txt":
        return path_or_dir  # explicit file path
    os.makedirs(path_or_dir, exist_ok=True)
    return os.path.join(path_or_dir, name)
