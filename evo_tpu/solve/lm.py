"""Batched Levenberg-Marquardt on manifolds — the framework's Ceres.

Replaces every Ceres solve in the reference with one jit/vmap-compatible
primitive:

- patch alignment: DENSE_QR LM, <=10 iters, Huber 0.3
  (`implementation/feature_tracker/src/optimizer.cpp:102-114`) — here a
  5-tangent-dim dense LM vmapped over all live patches at once;
- TV motion field / contrast-max: SPARSE_NORMAL_CHOLESKY
  (`feature_detector.cpp:219-228,405-416`) — here a dense normal-equation LM
  over the per-tile velocity field (the system is only ~2·num_tiles unknowns);
- bundle adjustment: SPARSE_SCHUR (`visual_odometry.cpp:486-497`) — built on
  the same linearize/weight machinery in evo_tpu.vo.ba with an explicit Schur
  complement.

Design
------
`residual_fn(x, data) -> r [R]` defines the problem; `x` lives on a manifold
with `retract(x, delta)` (defaults to Euclidean `x + delta`). Each iteration
linearizes in the *tangent space*: `J = d r(retract(x, d)) / d d |_{d=0}`
via `jax.jacfwd`, which subsumes Ceres' LocalParameterization plus-Jacobians
(`local_parameterization_se2.hpp:28-47`). Robustness is IRLS: Huber weights
computed per residual block (block = `block_size` consecutive residuals,
matching Ceres' per-residual-block loss application). Damped normal equations
`(JᵀWJ + λ diag(JᵀWJ)) δ = −JᵀWr` are solved densely (Cholesky with solve
fallback); a classic accept/reject trust-region update adapts λ. The whole
loop is a `lax.scan` with a static trip count, so `vmap(lm_solve)` batches
thousands of independent solves into single fused kernels — the reference
runs these serially (`feature_detector.cpp:585-619`).

All math is f32 by default; normal-equation accumulation happens in f32 with
Marquardt diagonal scaling, which conditions the small systems well enough
(SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

_EPS = 1e-12


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LMResult:
    x: Any  # solution point (ambient coordinates)
    cost: jax.Array  # [] final robust cost
    initial_cost: jax.Array  # [] cost at x0
    lam: jax.Array  # [] final damping
    num_accepted: jax.Array  # [] int32 accepted steps
    grad_norm: jax.Array  # [] infinity norm of final gradient


def huber_weights(block_sq_norms: jax.Array, delta: float) -> jax.Array:
    """IRLS weights for the Huber loss, given squared block norms."""
    n = jnp.sqrt(block_sq_norms + _EPS)
    return jnp.where(n <= delta, 1.0, delta / n)


def huber_cost(block_sq_norms: jax.Array, delta: float) -> jax.Array:
    """Sum of Huber rho over blocks (rho(s) in Ceres' convention: rho of the
    squared norm, 2*delta*n - delta^2 beyond the inlier region)."""
    n = jnp.sqrt(block_sq_norms + _EPS)
    quad = block_sq_norms
    lin = 2.0 * delta * n - delta * delta
    return jnp.sum(jnp.where(n <= delta, quad, lin))


def _block_sq_norms(r: jax.Array, block_size: int) -> jax.Array:
    return jnp.sum(r.reshape(-1, block_size) ** 2, axis=-1)


_SMALL_SOLVE_DIM = 8


def _solve_spd(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve SPD `A x = b`. For the tiny tangent systems (T ≤ 8) this is an
    *unrolled* scalar Cholesky — every op is a scalar that turns into one
    vectorized lane op under `vmap` over a solve batch, instead of the
    LAPACK-style loop kernel `cho_factor` lowers to (which serializes badly
    on TPU for thousands of tiny systems)."""
    t = A.shape[0]
    if t > _SMALL_SOLVE_DIM:
        L, low = jax.scipy.linalg.cho_factor(A, lower=True)
        return jax.scipy.linalg.cho_solve((L, low), b)
    # unrolled Cholesky A = L Lᵀ
    L = [[None] * t for _ in range(t)]
    for i in range(t):
        s = A[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-30))
        for j in range(i + 1, t):
            s = A[j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s / L[i][i]
    # forward substitution L y = b
    y = [None] * t
    for i in range(t):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution Lᵀ x = y
    x = [None] * t
    for i in reversed(range(t)):
        s = y[i]
        for k in range(i + 1, t):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


@partial(
    jax.jit,
    static_argnames=(
        "residual_fn", "retract", "tangent_dim", "num_iters", "block_size",
        "huber_delta", "max_step", "linearize_fn", "travel_fn", "max_travel",
        "ftol",
    ),
)
def lm_solve(
    residual_fn: Callable,
    x0: Any,
    data: Any = None,
    *,
    retract: Callable | None = None,
    tangent_dim: int | None = None,
    num_iters: int = 10,
    block_size: int = 1,
    huber_delta: float | None = None,
    init_lambda: float = 1e-4,
    lambda_up: float = 4.0,
    lambda_down: float = 0.5,
    min_lambda: float = 1e-9,
    max_lambda: float = 1e6,
    max_step: float | None = None,
    linearize_fn: Callable | None = None,
    active: jax.Array | None = None,
    travel_fn: Callable | None = None,
    max_travel: float | None = None,
    ftol: float = 1e-6,
) -> LMResult:
    """Dense damped Gauss-Newton / LM with fixed trip count.

    Parameters
    ----------
    residual_fn : (x, data) -> r[R]. Invalid residuals must already be
        zeroed/masked inside (masked entries contribute 0 to cost and J).
    x0 : initial ambient point (array or pytree of arrays).
    retract : (x, delta[T]) -> x'; default Euclidean add (then T = dim(x)).
    tangent_dim : T; required when `retract` is given.
    block_size : residuals per robust-loss block (1 = per-residual loss,
        2 = reprojection-error blocks as in `visual_odometry.cpp:470-480`).
    huber_delta : Huber threshold; None = pure least squares.
    max_step : trust-region cap on the tangent-step norm. Guards against
        pathological jumps into degenerate optima (e.g. warping a patch
        fully out of the image zeroes the alignment residuals).
    linearize_fn : optional (x, data) -> (r [R], J [R, T]) analytic
        linearization at d = 0 in the tangent space, replacing the autodiff
        path. Worth providing for hot residuals: forward-mode through a
        sampling/matmul residual materializes [T, R, ...] tangent
        intermediates, while an analytic J usually needs one extra matmul
        (see tracker.align.alignment_linearize).
    active : optional scalar bool — False marks this solve instance as a
        no-op (returns x0 after the initial linearization only). Matters
        under `vmap`: the batched `while_loop` iterates until the LAST lane
        converges, so masked-out lanes (e.g. non-ready patches whose results
        are discarded anyway) must not gate the batch's trip count with
        garbage-data iterations.
    travel_fn / max_travel : optional cumulative-travel cap. `travel_fn(x,
        x0, data) -> scalar` measures how far a candidate point has moved from
        the start in problem-specific units (e.g. warped-center pixels); any step
        whose candidate exceeds `max_travel` is rejected (lambda grows, like
        a failed cost decrease). Guards residuals that are only valid in a
        bounded region around x0 — the patch alignment's gradient window is
        anchored at the initial warp, so a solve must not out-travel the
        window's slack (see tracker.align._solve_one).
    """
    if retract is None:
        assert tangent_dim is None or tangent_dim == jnp.size(x0)
        tangent_dim = jnp.size(x0)
        shape = jnp.shape(x0)
        retract = lambda x, d: x + d.reshape(shape)
    assert tangent_dim is not None

    def robust_cost(r):
        s = _block_sq_norms(r, block_size)
        if huber_delta is None:
            return jnp.sum(s)
        return huber_cost(s, huber_delta)

    def weights(r):
        if huber_delta is None:
            return jnp.ones(r.shape[0] // block_size, r.dtype)
        return huber_weights(_block_sq_norms(r, block_size), huber_delta)

    zero_d = jnp.zeros(tangent_dim, jnp.result_type(jax.tree_util.tree_leaves(x0)[0]))

    def linearize(x):
        # jax.linearize evaluates the primal once and reuses the stored
        # linearization for every tangent — cheaper than jacfwd + a separate
        # primal eval (the residual's nonlinear work runs once, not T+1 times)
        if linearize_fn is not None:
            return linearize_fn(x, data)
        f = lambda d: residual_fn(retract(x, d), data)
        r, jvp_fn = jax.linearize(f, zero_d)
        J = jax.vmap(jvp_fn, out_axes=1)(
            jnp.eye(tangent_dim, dtype=zero_d.dtype)
        )  # [R, T]
        return r, J

    def normal_eq(r, J):
        """(A, g, cost) of the weighted normal equations at a linearization."""
        w = weights(r)  # [R / block]
        wr = jnp.repeat(w, block_size)  # per-residual weights
        JtW = J.T * wr[None, :]
        return JtW @ J, JtW @ r, robust_cost(r)

    # Deferred-accept LM: each iteration runs exactly ONE linearization — at
    # the candidate point — and keeps the BEST point's tiny (A [T,T], g [T])
    # system to re-solve with a larger lambda on rejection. The classic loop
    # (linearize at current x, then a separate residual eval at x_new for
    # accept/reject) pays linearize + residual per iteration; for sampling
    # residuals like the patch alignment, the residual eval alone is ~half a
    # linearize of MXU/VPU work. Results are identical: a rejected step
    # re-solves the same normal equations the classic loop would rebuild.
    # `ftol` defaults to Ceres' function_tolerance (1e-6); callers whose
    # costs live at f32 scales and who re-solve warm (e.g. the per-window
    # patch alignment) pass a looser value so converged lanes actually exit.

    def w_cond(state):
        _, _, _, _, _, _, it, done = state
        return (it < num_iters) & ~done

    def step(state):
        x, A, g, lam, cost, n_acc, it, _ = state
        diag = jnp.clip(jnp.diag(A), 1e-8, None)
        delta = -_solve_spd(A + lam * jnp.diag(diag), g)
        bad = ~jnp.all(jnp.isfinite(delta))
        delta = jnp.where(bad, jnp.zeros_like(delta), delta)
        if max_step is not None:
            dn = jnp.linalg.norm(delta)
            delta = delta * jnp.minimum(1.0, max_step / jnp.maximum(dn, 1e-12))
        x_new = retract(x, delta)
        r_new, J_new = linearize(x_new)
        A_new, g_new, cost_new = normal_eq(r_new, J_new)
        accept = jnp.isfinite(cost_new) & (cost_new < cost) & ~bad
        if travel_fn is not None and max_travel is not None:
            accept = accept & (travel_fn(x_new, x0, data) <= max_travel)
        # Ceres-style convergence: an accepted step whose relative cost
        # drop falls under function_tolerance ends the solve (under vmap,
        # converged problems mask out and the batch exits at the LAST
        # problem's trip count instead of always paying num_iters)
        done = accept & (cost - cost_new <= ftol * cost)
        sel = lambda a, b: jnp.where(accept, b, a)
        x_out = jax.tree_util.tree_map(sel, x, x_new)
        lam_out = jnp.clip(
            jnp.where(accept, lam * lambda_down, lam * lambda_up),
            min_lambda, max_lambda,
        )
        return (x_out, sel(A, A_new), sel(g, g_new), lam_out,
                sel(cost, cost_new), n_acc + accept.astype(jnp.int32),
                it + 1, done)

    r0, J0 = linearize(x0)
    A0, g0, cost0 = normal_eq(r0, J0)
    # derive constants from cost0 so their varying-manual-axes types match
    # the loop-carried outputs under shard_map
    zero_like_cost = cost0 * 0
    done0 = zero_like_cost.astype(bool)
    if active is not None:
        done0 = done0 | ~active
    init = (
        x0,
        A0,
        g0,
        jnp.asarray(init_lambda, r0.dtype) + zero_like_cost,
        cost0,
        zero_like_cost.astype(jnp.int32),
        zero_like_cost.astype(jnp.int32),
        done0,
    )
    (x, A, g, lam, cost, n_acc, _, _) = jax.lax.while_loop(
        w_cond, step, init
    )

    return LMResult(
        x=x,
        cost=cost,
        initial_cost=cost0,
        lam=lam,
        num_accepted=n_acc,
        grad_norm=jnp.max(jnp.abs(g)),
    )


def lm_solve_batched(residual_fn, x0_batch, data_batch=None, **kwargs):
    """vmap of `lm_solve` over a leading batch axis — one fused XLA program
    solving every problem in the batch simultaneously (the TPU answer to the
    reference's serial per-patch Ceres loop, SURVEY.md §2.3 item 1)."""
    fn = lambda x0, data: lm_solve(residual_fn, x0, data, **kwargs)
    return jax.vmap(fn)(x0_batch, data_batch)
