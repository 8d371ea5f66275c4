"""Two-view triangulation.

Replaces the reference's OpenGV `triangulate2` wrapper
(`implementation/visual_odometry/src/triangulation.cpp:7-29`): given bearing
vectors in two cameras and the relative pose, produce 3D landmarks in the
first camera's frame. We use the midpoint method (closed-form 2x2 normal
equations per correspondence) which is branch-free and vmaps over all
correspondences at once.
"""

from __future__ import annotations

import jax.numpy as jnp

from evo_tpu.core import lie


def triangulate_midpoint(f1, f2, pose_1_2):
    """Triangulate correspondences.

    Parameters
    ----------
    f1 : [..., 3] unit bearing vectors in camera 1.
    f2 : [..., 3] unit bearing vectors in camera 2.
    pose_1_2 : [7] SE3 pose of camera 2 expressed in camera 1 (T_1_2, i.e.
        p_1 = R p_2 + t) — same convention as the reference's
        `triangulateLandmarks` (triangulation.cpp:16-24).

    Returns
    -------
    points : [..., 3] landmark positions in camera-1 frame.
    depths : ([..., ], [...,]) depths along each ray (negative => behind).
    """
    r2 = lie.quat_rotate(pose_1_2[..., 0:4], f2)  # cam-2 rays in cam-1 frame
    t = jnp.broadcast_to(pose_1_2[..., 4:7], r2.shape)
    # minimize |d1 f1 - (d2 r2 + t)|^2 over (d1, d2)
    a = jnp.sum(f1 * f1, axis=-1)
    b = -jnp.sum(f1 * r2, axis=-1)
    c = jnp.sum(r2 * r2, axis=-1)
    e1 = jnp.sum(f1 * t, axis=-1)
    e2 = -jnp.sum(r2 * t, axis=-1)
    det = a * c - b * b
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    d1 = (c * e1 - b * e2) / det_safe
    d2 = (a * e2 - b * e1) / det_safe
    p_from_1 = d1[..., None] * f1
    p_from_2 = d2[..., None] * r2 + t
    return 0.5 * (p_from_1 + p_from_2), (d1, d2)


def triangulate_landmarks(f1, f2, pose_w_1, pose_w_2):
    """Triangulate into the *world* frame given two absolute camera poses
    (T_w_c convention: p_w = T_w_c · p_c), mirroring the call pattern of
    `addNewLandmarks` (`visual_odometry.cpp:343-377`)."""
    pose_1_2 = lie.se3_compose(lie.se3_inverse(pose_w_1), pose_w_2)
    p_c1, depths = triangulate_midpoint(f1, f2, pose_1_2)
    return lie.se3_apply(pose_w_1, p_c1), depths
