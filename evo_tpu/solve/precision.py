"""Compensated (two-float) accumulation for f32 normal equations.

SURVEY.md §7 hard part 6: the reference runs Ceres in f64 everywhere; TPU
prefers f32/bf16, so long reductions (BA normal-equation assembly over
thousands of observations, the 8-point Gram/SVD) need an option that keeps
their accumulation error independent of the reduction depth instead of
growing O(N)·eps. This module provides that option without `jax_enable_x64`
(f64 is emulated and slow on TPU): error-free transforms (Knuth two-sum)
carry a compensation term through chunked reductions, and the final value is
folded to the *correctly rounded* f32 of the true sum.

Used by `vo.ba.ba_solve(compensated=True)` (normal-equation blocks,
`visual_odometry.cpp:416-497` analogue) and
`solve.epipolar.eight_point(refine_null=True)` (null-vector iterative
refinement with compensated Gram products, `visual_odometry.cpp:299-311`
analogue).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def two_sum(a, b):
    """Error-free transform: s = fl(a+b), err exact (Knuth 2Sum).

    Requires round-to-nearest f32 (true on TPU and XLA:CPU).
    """
    s = a + b
    bp = s - a
    err = (a - (s - bp)) + (b - bp)
    return s, err


def compensated_reduce(parts, axis: int = 0):
    """Kahan-compensated sum over `axis` of an f32 array.

    Returns (hi, lo) with hi = running f32 sum, lo = accumulated rounding
    error; hi + lo ≈ the exact sum to ~2 ulp regardless of length.
    """
    parts = jnp.moveaxis(parts, axis, 0)

    def step(carry, x):
        s, c = carry
        # Neumaier variant: compensate regardless of operand ordering
        t, err = two_sum(s, x)
        return (t, c + err), None

    zero = jnp.zeros(parts.shape[1:], parts.dtype)
    (hi, lo), _ = jax.lax.scan(step, (zero, zero), parts)
    return hi, lo


def fold(hi, lo):
    """Collapse a two-float value to the correctly rounded f32 sum."""
    return two_sum(hi, lo)[0]


def _chunk(o: int, n_chunks: int) -> int:
    return -(-o // n_chunks)  # ceil


def compensated_scatter_add(idx, vals, n_out: int, n_chunks: int = 32):
    """Segment/scatter-add `vals` [O, ...] into [n_out, ...] by `idx` [O]
    with depth-independent accumulation error.

    Strategy: split the O observations into `n_chunks` chunks, scatter each
    chunk into its own partial accumulator (in-chunk error ≤ (O/C)·eps — one
    plain f32 scatter per chunk), then combine the C partials with a
    compensated scan whose own error is depth-independent. Total error is
    bounded by the CHUNK length, not the full reduction depth O — the naive
    `.at[idx].add(vals)` this replaces applies its additions in one
    O-long sequential chain per output slot (measured ~7-20x worse at
    O=2e5 on adversarial mixed-magnitude data, tests/test_precision.py).
    """
    O = vals.shape[0]
    c = _chunk(O, n_chunks)
    pad = c * n_chunks - O
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros(pad, idx.dtype)])
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad,) + vals.shape[1:], vals.dtype)]
        )
    idx = idx.reshape(n_chunks, c)
    vals = vals.reshape(n_chunks, c, *vals.shape[1:])

    def one_chunk(i, v):
        return jnp.zeros((n_out,) + v.shape[1:], v.dtype).at[i].add(v)

    parts = jax.vmap(one_chunk)(idx, vals)  # [C, n_out, ...]
    return fold(*compensated_reduce(parts, axis=0))


def compensated_gram(A, n_chunks: int = 16):
    """G = AᵀA for A [N, K] as a two-float pair (G_hi, G_lo).

    Per-chunk partial Grams ride the MXU (plain f32 matmuls); the cross-chunk
    reduction is compensated, so the entries of G_hi + G_lo are exact to the
    per-chunk level regardless of N.
    """
    N, K = A.shape
    c = _chunk(N, n_chunks)
    pad = c * n_chunks - N
    if pad:
        A = jnp.concatenate([A, jnp.zeros((pad, K), A.dtype)])
    Ac = A.reshape(n_chunks, c, K)
    parts = jnp.einsum("cni,cnj->cij", Ac, Ac)  # [C, K, K]
    return compensated_reduce(parts, axis=0)


def refined_null_vector(A, iters: int = 2, n_chunks: int = 16):
    """Unit vector e minimizing ‖A e‖, beyond the f32-SVD floor.

    Starts from the f32 SVD null vector, then runs `iters` steps of deflated
    eigen-refinement on G = AᵀA: the residual r = G e − λ e is evaluated with
    the compensated two-float Gram (the extra precision enters ONLY through
    the residual — classic iterative-refinement structure, so the f32
    factorization of the deflated system is sufficient).
    """
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    e = vt[-1]
    G_hi, G_lo = compensated_gram(A, n_chunks)
    K = A.shape[1]
    eye = jnp.eye(K, dtype=A.dtype)

    def step(e, _):
        g = G_hi @ e + G_lo @ e  # compensated matvec: lo term carries error
        lam = e @ g
        r = g - lam * e
        # deflate along e so the shifted system is well conditioned at the
        # smallest eigenvalue; solve in plain f32
        M = G_hi - lam * eye + jnp.outer(e, e)
        d = jnp.linalg.solve(M, -r)
        d = d - (e @ d) * e
        e2 = e + d
        e2 = e2 / jnp.maximum(jnp.linalg.norm(e2), 1e-30)
        # guard: keep the refinement only if it did not blow up
        ok = jnp.all(jnp.isfinite(e2))
        return jnp.where(ok, e2, e), None

    e, _ = jax.lax.scan(step, e, None, length=iters)
    return e


@partial(jax.jit, static_argnames=("n_out", "n_chunks"))
def _csa_jit(idx, vals, n_out, n_chunks):
    return compensated_scatter_add(idx, vals, n_out, n_chunks)
