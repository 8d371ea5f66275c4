"""Sliding-window bundle adjustment with an explicit Schur complement.

Replaces the reference's Ceres SPARSE_SCHUR solve
(`VisualOdometryFrontEnd::optimize`, `visual_odometry.cpp:416-497`) and its
reprojection functor (`reprojection_error.h:8-28`):

    residual_o = p2d_o − π(intr, T_w_c[f_o]⁻¹ · X[l_o])      (2 per obs)

with Huber(0.8) per observation block, camera intrinsics constant, and the
first two active poses held fixed for gauge freedom.

TPU shape: observations are packed into padded arrays [O] with masks; per-obs
pose/landmark Jacobians come from one vmapped `jacfwd`; the normal equations
are assembled by scatter-adds into dense per-frame/per-landmark blocks; the
landmark block is eliminated in closed form (batched 3x3 inverses) and the
reduced camera system ([6F, 6F], F <= 20 → at most 120x120) is solved
densely — the window is small enough that batching, not sparsity, is the win
(SURVEY.md §7 hard part 4). The LM loop is a fixed-trip `lax.scan` with
accept/reject damping.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from evo_tpu.core import camera, lie
from evo_tpu.solve.lm import huber_weights
from evo_tpu.solve.precision import compensated_scatter_add

HUBER = 0.8
MAX_ITERS = 50


def _reproj_residual(pose, lm, intr, p2d):
    """[2] reprojection residual (reprojection_error.h:13-25)."""
    p_cam = lie.se3_apply(lie.se3_inverse(pose), lm)
    return p2d - camera.project(intr, p_cam)


def _obs_linearize_autodiff(pose, lm, intr, p2d):
    """Residual + Jacobians in (pose-tangent [6], landmark [3]) by autodiff —
    the reference implementation `_obs_linearize` is checked against."""

    def f(d6, d3):
        return _reproj_residual(lie.se3_retract(pose, d6), lm + d3, intr, p2d)

    z6 = jnp.zeros(6, pose.dtype)
    z3 = jnp.zeros(3, pose.dtype)
    r = f(z6, z3)
    Jp, Jl = jax.jacfwd(f, argnums=(0, 1))(z6, z3)  # [2,6], [2,3]
    return r, Jp, Jl


def _obs_linearize(pose, lm, intr, p2d):
    """Analytic residual + Jacobians in (pose-tangent [6], landmark [3]).

    The autodiff version pushes 9 JVP columns through the full
    retract∘inverse∘apply∘project chain; vmapped over ~2k observations it
    was the single largest term of a BA iteration (1.4 ms of 2.5 ms on the
    host backend). The chain rule splits cleanly instead:

      p_c(δ, d3) = (T·exp(δ))⁻¹ · (X + d3) = exp(−δ) · (R(q)ᵀ (X + d3 − t))

    so at δ=0 (where the LM step linearizes — the derivative of exp at the
    origin is the identity map on the tangent):

      ∂p_c/∂δ = [−I₃ | [p_c]ₓ]      (tangent order (v, ω), lie.se3_exp)
      ∂p_c/∂d3 = R(q)ᵀ

    and only the [2,3] projection Jacobian ∂π/∂p_c still comes from jacfwd
    (3 JVPs through project alone — it carries the full radtan distortion,
    camera_model.h:49-77)."""
    q = pose[0:4]
    Rt = lie.quat_to_matrix(q).T  # R_cw
    p_c = Rt @ (lm - pose[4:7])
    r = p2d - camera.project(intr, p_c)
    Jpi = jax.jacfwd(lambda p: camera.project(intr, p))(p_c)  # [2,3]
    px = jnp.array([
        [0.0, -p_c[2], p_c[1]],
        [p_c[2], 0.0, -p_c[0]],
        [-p_c[1], p_c[0], 0.0],
    ], pose.dtype)  # [p_c]ₓ
    # r = p2d − π(p_c) ⇒ J = −Jπ · ∂p_c/∂·
    Jp = jnp.concatenate([Jpi, -Jpi @ px], axis=1)  # −Jπ·(−I) | −Jπ·[p]ₓ
    Jl = -Jpi @ Rt
    return r, Jp, Jl


def _inv3(m):
    """Batched closed-form 3x3 inverse."""
    return jnp.linalg.inv(m)


@partial(jax.jit, static_argnames=("num_iters", "compensated"))
def ba_solve(
    poses,
    landmarks,
    intr,
    obs_frame,
    obs_lm,
    obs_p2d,
    obs_mask,
    pose_fixed,
    *,
    num_iters: int = MAX_ITERS,
    huber: float = HUBER,
    compensated: bool = False,
    tol: float = 1e-6,
):
    """Run the windowed BA.

    poses [F, 7] (T_w_c), landmarks [L, 3], intr [9] (constant),
    obs_frame/obs_lm [O] int32 indices, obs_p2d [O, 2], obs_mask [O] bool,
    pose_fixed [F] bool (gauge: first two active frames).

    `compensated=True` assembles the normal-equation blocks with two-float
    (Kahan) chunked accumulation (solve.precision) so every block entry is
    the correctly rounded f32 sum regardless of observation count — the
    f32-native answer to the reference's all-f64 Ceres assembly (SURVEY §7
    hard part 6). The LM path itself stays f32.

    `tol` is the Ceres-style function tolerance: an accepted step whose
    relative cost decrease falls below it ends the solve.

    (A pair-decomposed Schur reduction — contributions over same-landmark
    observation pairs instead of the dense [L, F, 6, 3] coupling tensor —
    was measured here and REJECTED: 22× fewer block MACs, but the gathers
    and tiny batched [6,3]@[3,6] matmuls run slower than the dense einsum
    on both backends at these shapes, and the pair count grows toward the
    dense cost as tracks lengthen. The dense path IS the XLA-friendly
    formulation.)

    Returns (poses', landmarks', final_cost, initial_cost, iterations).
    """
    F = poses.shape[0]
    L = landmarks.shape[0]
    dtype = poses.dtype
    wmask = obs_mask.astype(dtype)

    def linearize(poses, landmarks):
        p = poses[obs_frame]
        x = landmarks[obs_lm]
        r, Jp, Jl = jax.vmap(_obs_linearize, in_axes=(0, 0, None, 0))(
            p, x, intr, obs_p2d
        )
        # robust IRLS weight per 2-residual block (HuberLoss per obs)
        s = jnp.sum(r * r, axis=-1)
        w = huber_weights(s, huber) * wmask  # [O]
        # zero fixed-pose Jacobians (SetParameterBlockConstant)
        Jp = jnp.where(pose_fixed[obs_frame][:, None, None], 0.0, Jp)
        return r, Jp, Jl, w

    def robust_cost(poses, landmarks):
        p = poses[obs_frame]
        x = landmarks[obs_lm]
        r = jax.vmap(_reproj_residual, in_axes=(0, 0, None, 0))(p, x, intr, obs_p2d)
        s = jnp.sum(r * r, axis=-1)
        n = jnp.sqrt(s + 1e-12)
        rho = jnp.where(n <= huber, s, 2.0 * huber * n - huber * huber)
        return jnp.sum(rho * wmask)

    lm_has_obs = (
        jnp.zeros(L, dtype).at[obs_lm].add(wmask) > 0
    )  # padding landmarks stay put

    def step(state):
        poses, landmarks, lam, cost, it, done = state
        r, Jp, Jl, w = linearize(poses, landmarks)
        wr = r * w[:, None]  # weighted residuals
        # block assembly via scatter-add (optionally depth-error-free)
        v_Hpp = jnp.einsum("oij,oik->ojk", Jp * w[:, None, None], Jp)
        v_Hll = jnp.einsum("oij,oik->ojk", Jl * w[:, None, None], Jl)
        v_bp = jnp.einsum("oij,oi->oj", Jp, wr)
        v_bl = jnp.einsum("oij,oi->oj", Jl, wr)
        # per-(landmark, frame) coupling blocks A[l, f] = Σ_o w JpᵀJl
        v_A = jnp.einsum("oij,oik->ojk", Jp * w[:, None, None], Jl)
        if compensated:
            Hpp = compensated_scatter_add(obs_frame, v_Hpp, F)
            Hll = compensated_scatter_add(obs_lm, v_Hll, L)
            bp = compensated_scatter_add(obs_frame, v_bp, F)
            bl = compensated_scatter_add(obs_lm, v_bl, L)
            A = compensated_scatter_add(
                obs_lm * F + obs_frame, v_A, L * F
            ).reshape(L, F, 6, 3)
        else:
            Hpp = jnp.zeros((F, 6, 6), dtype).at[obs_frame].add(v_Hpp)
            Hll = jnp.zeros((L, 3, 3), dtype).at[obs_lm].add(v_Hll)
            bp = jnp.zeros((F, 6), dtype).at[obs_frame].add(v_bp)
            bl = jnp.zeros((L, 3), dtype).at[obs_lm].add(v_bl)
            A = jnp.zeros((L, F, 6, 3), dtype).at[obs_lm, obs_frame].add(v_A)
        # damping (Marquardt diagonal scaling)
        dpp = jnp.clip(jnp.diagonal(Hpp, axis1=1, axis2=2), 1e-8, None)
        dll = jnp.clip(jnp.diagonal(Hll, axis1=1, axis2=2), 1e-8, None)
        Hpp = Hpp + lam * jax.vmap(jnp.diag)(dpp)
        Hll = Hll + lam * jax.vmap(jnp.diag)(dll)
        # keep fixed poses / unobserved landmarks invertible + pinned
        Hpp = Hpp + jnp.where(pose_fixed[:, None, None], 1.0, 0.0) * jnp.eye(6, dtype=dtype)
        Hll = Hll + jnp.where(lm_has_obs[:, None, None], 0.0, 1.0) * jnp.eye(3, dtype=dtype)

        Hll_inv = _inv3(Hll)  # [L, 3, 3]
        T = jnp.einsum("lfij,ljk->lfik", A, Hll_inv)  # [L, F, 6, 3]
        # reduced camera system S = Hpp − Σ_l T_l A_lᵀ ; v = bp − Σ_l T_l bl_l
        S_off = jnp.einsum("lfij,lgkj->fgik", T, A)  # [F, F, 6, 6]
        S = -S_off
        S = S.at[jnp.arange(F), jnp.arange(F)].add(Hpp)
        S = S.transpose(0, 2, 1, 3).reshape(6 * F, 6 * F)
        v = bp - jnp.einsum("lfij,lj->fi", T, bl)  # [F, 6]
        rhs = -v.reshape(6 * F)
        Lc, low = jax.scipy.linalg.cho_factor(S, lower=True)
        dp = jax.scipy.linalg.cho_solve((Lc, low), rhs).reshape(F, 6)
        bad = ~jnp.all(jnp.isfinite(dp))
        dp = jnp.where(bad, 0.0, dp)
        # back-substitute landmarks: δl = −Hll⁻¹ (bl + Σ_f A_lfᵀ δp_f)
        Alp = jnp.einsum("lfij,fi->lj", A, dp)  # [L, 3]
        dl = -jnp.einsum("lij,lj->li", Hll_inv, bl + Alp)
        dl = jnp.where(bad | ~lm_has_obs[:, None], 0.0, dl)

        poses_new = jax.vmap(lie.se3_retract)(poses, dp)
        poses_new = jnp.where(pose_fixed[:, None], poses, poses_new)
        lms_new = landmarks + dl
        cost_new = robust_cost(poses_new, lms_new)
        accept = jnp.isfinite(cost_new) & (cost_new < cost) & ~bad
        # Ceres-style early termination (function_tolerance 1e-6,
        # Solver::Options default): an accepted step that no longer moves
        # the cost, or damping grown past any useful scale (every recent
        # step rejected), ends the solve — the reference's <=50 iterations
        # is a CAP, Ceres typically stops after a handful, and a fixed-trip
        # scan was paying all 50 every window.
        rel_decrease = (cost - cost_new) / jnp.maximum(cost, 1e-12)
        done = (accept & (rel_decrease < tol)) | (lam > 1e6)
        poses = jnp.where(accept, poses_new, poses)
        landmarks = jnp.where(accept, lms_new, landmarks)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        cost = jnp.where(accept, cost_new, cost)
        return poses, landmarks, lam, cost, it + 1, done

    cost0 = robust_cost(poses, landmarks)
    init = (poses, landmarks, jnp.asarray(1e-4, dtype), cost0,
            jnp.int32(0), jnp.asarray(False))
    poses, landmarks, _, cost, n_it, _ = jax.lax.while_loop(
        lambda s: (s[4] < num_iters) & ~s[5], step, init
    )
    return poses, landmarks, cost, cost0, n_it
