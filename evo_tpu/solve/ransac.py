"""Batched-hypothesis RANSAC.

Replaces OpenGV's sequential `sac::Ransac` loops (8-point bootstrap at
`visual_odometry.cpp:299-318`, P3P localization at `:243-259`) with the
TPU-shaped formulation: draw H minimal samples up front, solve all H
hypotheses with one vmapped kernel, score all hypotheses against all
correspondences with one [H, N] residual matrix, and argmax the inlier
count. No data-dependent iteration counts, no early exit — wall-clock is one
fused program (SURVEY.md §2.3 item 1 / §7 hard part 3).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from evo_tpu.core import lie
from evo_tpu.solve import epipolar, p3p


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RansacResult:
    model: Any  # best model parameters
    inliers: jax.Array  # [N] bool
    num_inliers: jax.Array  # [] int32
    best_idx: jax.Array  # [] int32 hypothesis index


def _sample_indices(key, num_hyp, sample_size, n_valid, n_max):
    """[H, S] random indices into the first `n_valid` entries.

    Sampling is with replacement per hypothesis (duplicates make a degenerate
    minimal set that simply scores poorly — cheaper than rejection on TPU).
    """
    return jax.random.randint(key, (num_hyp, sample_size), 0, jnp.maximum(n_valid, 1)) % n_max


def ransac(
    key,
    solver: Callable,
    residual_fn: Callable,
    data: Any,
    n_valid,
    n_max: int,
    *,
    sample_size: int,
    num_hypotheses: int = 256,
    threshold: float = 1e-3,
    valid_mask=None,
):
    """Generic batched RANSAC.

    solver : (sample_data) -> (models [M, ...], model_valid [M]) — M candidate
        models per minimal sample (e.g. 4 P3P roots).
    residual_fn : (model, data) -> residuals [N] (>= 0).
    data : pytree with leading axis N = n_max (padded); `n_valid` entries real.
    """
    keys = jax.random.split(key, 1)[0]
    idx = _sample_indices(keys, num_hypotheses, sample_size, n_valid, n_max)  # [H, S]

    take = lambda a: jnp.take(a, idx, axis=0)  # [H, S, ...]
    sample_data = jax.tree_util.tree_map(take, data)

    models, model_valid = jax.vmap(solver)(sample_data)  # [H, M, ...], [H, M]

    flat_models = jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:]), models
    )
    flat_valid = model_valid.reshape(-1)  # [H*M]

    def score(model, ok):
        r = residual_fn(model, data)  # [N]
        inl = (r < threshold) & ok
        if valid_mask is not None:
            inl = inl & valid_mask
        return inl

    inlier_matrix = jax.vmap(score)(flat_models, flat_valid)  # [H*M, N]
    counts = jnp.sum(inlier_matrix, axis=-1)
    best = jnp.argmax(counts)
    best_model = jax.tree_util.tree_map(lambda a: a[best], flat_models)
    return RansacResult(
        model=best_model,
        inliers=inlier_matrix[best],
        num_inliers=counts[best].astype(jnp.int32),
        best_idx=best.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Problem-specific front ends
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("num_hypotheses",))
def relative_pose_ransac(
    key,
    f1,
    f2,
    n_valid,
    *,
    num_hypotheses: int = 256,
    threshold: float = 1e-4,
    coarse_threshold: float = 2e-3,
    valid_mask=None,
):
    """2D-2D bootstrap: 8-point essential RANSAC over bearing pairs.

    Mirrors `findInliersRansac` (`visual_odometry.cpp:288-341`) with
    OpenGV's scoring semantics: each minimal 8-point essential estimate is
    decomposed into its 4 (R, t) candidates and every candidate is scored by
    the *triangulated angular reprojection* residual (the statistic the
    reference's 5e-5 threshold is calibrated against — the raw algebraic
    epipolar error both has an f32 precision floor and is biased toward
    spurious solutions under low parallax). The best pose is then refined
    nonlinearly on its inliers (`optimize_nonlinear`) and inliers are
    reselected (`selectWithinDistance`).

    Returns (pose_1_2 with unit translation, RansacResult with the final
    inlier set). f1, f2: [N, 3] padded unit bearings.
    """
    del coarse_threshold  # superseded by geometric scoring
    n_max = f1.shape[0]

    def solver(sample):
        s1, s2 = sample
        E = epipolar.eight_point(s1, s2)
        return epipolar.decompose_candidates(E), jnp.ones((4,), bool)

    def residual(pose_1_2, data):
        d1, d2 = data
        return epipolar.relative_reprojection_residual(pose_1_2, d1, d2)

    res = ransac(
        key, solver, residual, (f1, f2), n_valid, n_max,
        sample_size=8, num_hypotheses=num_hypotheses,
        threshold=threshold, valid_mask=valid_mask,
    )
    # nonlinear refinement on the inliers
    w = res.inliers.astype(f1.dtype)
    pose_1_2 = epipolar.refine_relative_pose(res.model, f1, f2, w)
    # reselect inliers against the refined model
    r = epipolar.relative_reprojection_residual(pose_1_2, f1, f2)
    inl = r < threshold
    if valid_mask is not None:
        inl = inl & valid_mask
    res = RansacResult(
        model=res.model,
        inliers=inl,
        num_inliers=jnp.sum(inl).astype(jnp.int32),
        best_idx=res.best_idx,
    )
    return pose_1_2, res


@partial(jax.jit, static_argnames=("num_hypotheses",))
def absolute_pose_ransac(
    key,
    bearings,
    points,
    n_valid,
    *,
    num_hypotheses: int = 128,
    threshold: float = 1.12e-4,  # 1 - cos(atan2(3px, 200)) ~ reference default
    valid_mask=None,
):
    """2D-3D localization: P3P RANSAC.

    Mirrors `localizeCamera` (`visual_odometry.cpp:212-286`): minimal
    3-point Grunert solves (all 4 roots scored), angular inlier threshold
    `1 - cos(atan2(3px, 200))` by default. Returns best `pose_w_c` + result.
    bearings, points: [N, 3] padded.
    """
    n_max = bearings.shape[0]

    def solver(sample):
        sb, sp = sample
        return p3p.p3p_grunert(sb, sp)  # [4, 7], [4]

    def residual(pose, data):
        db, dp = data
        return p3p.reprojection_angle_residual(pose, db, dp)

    res = ransac(
        key, solver, residual, (bearings, points), n_valid, n_max,
        sample_size=3, num_hypotheses=num_hypotheses, threshold=threshold,
        valid_mask=valid_mask,
    )
    return res.model, res


def _abs_pose_res_fn(pose, data):
    # module-level (not a per-call closure): `lm_solve` hashes its static
    # residual_fn, so a fresh closure would force a retrace on every call
    b, p, w = data
    return p3p.reprojection_angle_residual(pose, b, p) * w


def refine_absolute_pose(pose_w_c, bearings, points, inliers, num_iters: int = 10):
    """Nonlinear refinement of an absolute pose on its inlier set (the
    reference's `optimize_nonlinear` step, visual_odometry.cpp:261-262),
    minimizing angular residuals with our LM on the SE(3) manifold."""
    from evo_tpu.solve.lm import lm_solve

    w = inliers.astype(bearings.dtype)
    out = lm_solve(
        _abs_pose_res_fn,
        pose_w_c,
        (bearings, points, w),
        retract=lie.se3_retract,
        tangent_dim=6,
        num_iters=num_iters,
    )
    return out.x


@partial(jax.jit, static_argnames=("num_hypotheses",))
def localize_camera_fused(
    key, intr, pix, points, n_valid, valid_mask, threshold,
    *, num_hypotheses: int = 128,
):
    """The whole 2D-3D localization stage in ONE dispatch: unproject the
    padded pixel observations, P3P RANSAC, nonlinear refinement on the
    inliers, and inlier reselection (`localizeCamera`,
    visual_odometry.cpp:212-286). The stage runs per keyframe on the host
    CPU backend where each separate dispatch costs ~1 ms of the VO critical
    path — unfusing this was three dispatches plus two host round trips."""
    from evo_tpu.core import camera

    bearings = camera.unproject(intr, pix)
    pose, res = absolute_pose_ransac(
        key, bearings, points, n_valid,
        num_hypotheses=num_hypotheses, threshold=threshold,
        valid_mask=valid_mask,
    )
    refined, inl = refine_absolute_pose_reselect(
        pose, bearings, points, res.inliers, threshold
    )
    return refined, inl & valid_mask


@jax.jit
def refine_absolute_pose_reselect(pose_w_c, bearings, points, inliers,
                                  threshold):
    """refine_absolute_pose + inlier reselection in ONE dispatch (the
    reference refines then re-selects, visual_odometry.cpp:255-276; the VO
    frontend runs per keyframe on the host CPU backend, where each separate
    dispatch costs ~1 ms of the critical path)."""
    from evo_tpu.solve.p3p import reprojection_angle_residual

    refined = refine_absolute_pose(pose_w_c, bearings, points, inliers)
    r = reprojection_angle_residual(refined, bearings, points)
    return refined, r < threshold
