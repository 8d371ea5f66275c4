"""Essential-matrix estimation: 8-point algorithm + decomposition.

Replaces OpenGV's `CentralRelativePoseSacProblem::EIGHTPT`
(`visual_odometry.cpp:299-311`) and the epipolar inlier check
`findInliersEssential` (`triangulation.cpp:31-63`). Everything is
branch-free linear algebra (SVD) so minimal-sample solves vmap into a
single batched kernel for RANSAC.

Conventions: correspondences are *unit bearing vectors* (f1 in cam1, f2 in
cam2). The essential matrix satisfies f2ᵀ E f1 = 0 with E = [t]ₓ R, where
(R, t) = T_2_1 maps cam-1 coordinates into cam-2 (p_2 = R p_1 + t).
"""

from __future__ import annotations

import jax.numpy as jnp

from evo_tpu.core import lie
from evo_tpu.solve.triangulate import triangulate_midpoint


def essential_from_rt(q_2_1, t_2_1):
    """E = [t]ₓ R from the cam1→cam2 transform (`computeEssential`,
    triangulation.cpp:55-63)."""
    R = lie.quat_to_matrix(q_2_1)
    return lie.so3_hat(t_2_1) @ R


def eight_point(f1, f2, weights=None, refine_null: bool = False):
    """Linear 8-point essential estimate from N >= 8 bearing pairs.

    f1, f2: [N, 3]. weights: optional [N] (0 masks a row out).
    Returns E [3, 3] projected onto the essential manifold (sv = (1, 1, 0)).

    `refine_null=True` runs compensated-Gram iterative refinement of the
    null vector (solve.precision.refined_null_vector) — the f32 answer to the
    reference's f64 SVD (SURVEY §7 hard part 6): the linear f32 null space
    has a ~1e-3 residual floor that the refinement pushes to the ~1e-6 level
    on conditioned problems.
    """
    # rows: kron(f1_i, f2_i) so that vec(E) solves A e = 0 with
    # f2ᵀ E f1 = sum_jk E_jk f2_j f1_k
    A = (f2[:, :, None] * f1[:, None, :]).reshape(-1, 9)  # [N, 9]
    if weights is not None:
        A = A * weights[:, None]
    if refine_null:
        from evo_tpu.solve.precision import refined_null_vector

        e = refined_null_vector(A)
    else:
        # null vector via SVD of A
        _, _, vt = jnp.linalg.svd(A, full_matrices=True)
        e = vt[-1]
    E = e.reshape(3, 3)
    # project to essential manifold
    u, s, vt2 = jnp.linalg.svd(E)
    s_proj = jnp.array([1.0, 1.0, 0.0], E.dtype)
    return u @ jnp.diag(s_proj) @ vt2


def epipolar_residual(E, f1, f2):
    """|f2ᵀ E f1| per correspondence — the inlier statistic of
    `findInliersEssential` (triangulation.cpp:39-52)."""
    Ef1 = f1 @ E.T  # [N, 3]
    return jnp.abs(jnp.sum(f2 * Ef1, axis=-1))


def relative_reprojection_residual(pose_1_2, f1, f2):
    """OpenGV-style relative-pose inlier statistic: triangulate each
    correspondence under the candidate pose and sum the angular reprojection
    errors (1 − cosθ) in both views. This is what the reference's RANSAC
    threshold 5e-5 (`visual_odometry.h:34` ransacThreshold) is calibrated
    against — OpenGV's CentralRelativePoseSacProblem scores triangulated
    reprojections, not the algebraic epipolar constraint."""
    p1, (d1, d2) = triangulate_midpoint(f1, f2, pose_1_2)
    n1 = p1 / jnp.maximum(jnp.linalg.norm(p1, axis=-1, keepdims=True), 1e-12)
    p2 = lie.se3_apply(lie.se3_inverse(pose_1_2), p1)
    n2 = p2 / jnp.maximum(jnp.linalg.norm(p2, axis=-1, keepdims=True), 1e-12)
    r = (1.0 - jnp.sum(f1 * n1, axis=-1)) + (1.0 - jnp.sum(f2 * n2, axis=-1))
    # behind-camera points are outliers by construction
    return jnp.where((d1 > 0) & (d2 > 0), r, 1.0)


def refine_relative_pose(pose_1_2, f1, f2, weights, num_iters: int = 10):
    """Nonlinear refinement of a relative pose on weighted correspondences —
    the counterpart of OpenGV's `optimize_nonlinear` after the 8-point RANSAC
    (`visual_odometry.cpp:319-320`). Minimizes the epipolar residuals
    |f2ᵀ E(T) f1| over the SE(3) manifold with the translation re-normalized
    to unit length each step (scale is unobservable). Recovers the precision
    the f32 8-point SVD cannot reach (the linear null-space solution has a
    ~1e-3 f32 residual floor; the refined pose reaches the ~1e-7 eval floor).
    """
    from evo_tpu.solve.lm import lm_solve

    pose_2_1 = lie.se3_inverse(pose_1_2)
    out = lm_solve(
        _epipolar_res_fn, pose_2_1, (f1, f2, weights),
        retract=_unit_translation_retract, tangent_dim=6, num_iters=num_iters,
    )
    return lie.se3_inverse(out.x)


# module-level (not per-call closures): `lm_solve` hashes its static
# residual_fn/retract, so fresh closures would retrace on every call
def _unit_translation_retract(x, d):
    x2 = lie.se3_retract(x, d)
    t = x2[4:7]
    n = jnp.linalg.norm(t)
    t = jnp.where(n > 1e-9, t / jnp.maximum(n, 1e-9), t)
    return jnp.concatenate([x2[0:4], t])


def _epipolar_res_fn(x, data):
    ff1, ff2, w = data
    E = essential_from_rt(x[0:4], x[4:7])
    return epipolar_residual(E, ff1, ff2) * w


def decompose_candidates(E):
    """E → all 4 (R, t) candidates as poses_1_2 [4, 7] (unit translation),
    without cheirality selection — callers score candidates geometrically
    (cheirality is folded into `relative_reprojection_residual`, which maps
    behind-camera triangulations to a large residual)."""
    u, _, vt = jnp.linalg.svd(E)
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = u @ W @ vt
    Rb = u @ W.T @ vt
    t = u[:, 2]

    def pose_1_2_from(R_2_1, t_2_1):
        q = lie.quat_from_matrix(R_2_1)
        return lie.se3_inverse(jnp.concatenate([q, t_2_1]))

    return jnp.stack([
        pose_1_2_from(Ra, t), pose_1_2_from(Ra, -t),
        pose_1_2_from(Rb, t), pose_1_2_from(Rb, -t),
    ])


def decompose_essential(E, f1, f2, mask=None):
    """E → the physically valid (R, t) among the 4 candidates.

    Disambiguates by cheirality: triangulate all correspondences under each
    candidate and count points with positive depth in both views. Returns
    `pose_1_2` [7] (camera 2 in camera 1 frame, unit-norm translation — the
    reference normalizes the bootstrap translation to unit length,
    `visual_odometry.cpp:331-333`).
    """
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = u @ W @ vt
    Rb = u @ W.T @ vt
    t = u[:, 2]
    n = f1.shape[0]
    if mask is None:
        mask = jnp.ones(n, bool)

    def score(R_2_1, t_2_1):
        # candidate is T_2_1; convert to T_1_2 for triangulation
        q = lie.quat_from_matrix(R_2_1)
        pose_2_1 = jnp.concatenate([q, t_2_1])
        pose_1_2 = lie.se3_inverse(pose_2_1)
        _, (d1, d2) = triangulate_midpoint(f1, f2, pose_1_2)
        good = (d1 > 0) & (d2 > 0) & mask
        return jnp.sum(good), pose_1_2

    cands = [(Ra, t), (Ra, -t), (Rb, t), (Rb, -t)]
    scores = []
    poses = []
    for R_c, t_c in cands:
        s, p = score(R_c, t_c)
        scores.append(s)
        poses.append(p)
    scores = jnp.stack(scores)
    poses = jnp.stack(poses)
    best = jnp.argmax(scores)
    pose = poses[best]
    # normalize translation to unit length (bootstrap scale convention)
    t_best = pose[4:7]
    t_norm = jnp.linalg.norm(t_best)
    t_unit = jnp.where(t_norm > 1e-9, t_best / jnp.maximum(t_norm, 1e-9), t_best)
    return jnp.concatenate([pose[0:4], t_unit]), scores[best]
