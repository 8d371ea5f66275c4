"""Batched event-patch alignment — the tracker's core solve.

Replaces the reference's per-patch Ceres LM (`optimizer.cpp:62-206` with
cost `optimizer_cost.h:29-96`): align the normalized integrated event patch
against the flow-projected keyframe gradients under an SE(2) warp + flow
angle. One `vmap`ped LM solves every live patch simultaneously.

Semantics mirrored from the reference:
- integration: newest `num_of_events` events splatted with nearest-pixel
  signed accumulation into the *current* rect (`patch.cpp:65-85`),
  normalized by Frobenius norm (`patch.cpp:157-160`);
- residual at patch pixel q (absolute image coords a = q + rect.tl):
  r(q) = pred(q)/sqrt(1e-5 + Σ pred²) + I_norm(q), with
  pred(q) = g(W·a)·(cos φ, sin φ) and r = 0 outside the image
  (`optimizer_cost.h:34-91`); alignment drives pred → −I;
- one robust block: Huber(0.3) on the whole-patch residual norm, Ceres
  `final_cost = 0.5·ρ(‖r‖²)` (`optimizer.cpp:96-99`); lost when the median
  of the last 5 final costs exceeds 0.6 (`optimizer.cpp:137-157`);
- post-solve: φ ← φ mod 2π, rect center ← W⁻¹·init_pt
  (`patch.cpp:49-63`), time_without_update ← 1e6/max(0.1, ‖Δcenter‖) µs
  (`optimizer.cpp:166-177`), counter reset (`patch.cpp:160-163`);
- adaptive event budget from the L1 norm of the warped, flow-projected
  gradients over the current rect (`feature_detector.cpp:666-712`),
  clamped to [100, 300]; center within 5 px of the border → lost.
"""

from __future__ import annotations

import dataclasses
import os
from functools import lru_cache

import jax
import jax.numpy as jnp

from evo_tpu.core import lie
from evo_tpu.kernels import interp
from evo_tpu.solve.lm import lm_solve
from evo_tpu.tracker import patch_state as ps

HUBER = 0.3
MAX_LM_ITERS = 10
# function tolerance of the per-patch alignment solve (see _solve_one)
ALIGN_FTOL = 1e-4
LOST_COST_THRESHOLD = 0.6
TIME_WITHOUT_UPDATE_SCALE = 1.0  # seconds·px (reference 1e6 µs·px)


def _nearest_sep_splat(rx, ry, w):
    """Separable nearest splat of per-patch events into [P, S, S]: one-hot
    row/column tap matrices contracted on the MXU instead of XLA scatter
    (the same image = Yᵀ@X trick as kernels.splat, exact for integer-rounded
    coordinates). rx, ry: [P, E] integer-valued f32 patch coords; w: [P, E]."""
    grid = jnp.arange(ps.PATCH_SIDE, dtype=jnp.float32)
    ytap = (jnp.abs(ry[:, :, None] - grid) < 0.5).astype(jnp.float32)  # [P, E, S]
    xtap = (jnp.abs(rx[:, :, None] - grid) < 0.5).astype(jnp.float32)
    return jnp.einsum(
        "pes,pet->pst", ytap * w[:, :, None], xtap,
        preferred_element_type=jnp.float32,
    )


def integrate_events(table: ps.PatchTable) -> jax.Array:
    """[P, S, S] signed nearest-pixel event integration over current rects
    (`Patch::integrateEvents`, patch.cpp:65-85). Events outside the (possibly
    moved) rect are dropped, like the reference's `patch_.contains` check."""
    t, x, y, p_sign, valid = ps.newest_events(table)
    tlx = table.center[:, 0] - ps.PATCH_EXTENT  # [P]
    tly = table.center[:, 1] - ps.PATCH_EXTENT
    # relative integer coords (events carry integer pixel positions)
    rx = jnp.round(x - tlx[:, None])
    ry = jnp.round(y - tly[:, None])
    inside = (
        (rx >= 0) & (rx < ps.PATCH_SIDE) & (ry >= 0) & (ry < ps.PATCH_SIDE)
    )
    w = jnp.where(valid & inside, p_sign, 0.0)
    return _nearest_sep_splat(rx, ry, w)


def batch_timestamps(table: ps.PatchTable):
    """(mid, oldest) timestamps of each patch's integration set
    (patch.cpp:78-84: currentTimestamp = (newest+oldest)/2,
    timeLastUpdate = oldest)."""
    t, _, _, _, valid = ps.newest_events(table)
    big = jnp.float32(1e30)
    t_min = jnp.min(jnp.where(valid, t, big), axis=1)
    t_max = jnp.max(jnp.where(valid, t, -big), axis=1)
    has = jnp.any(valid, axis=1)
    mid = jnp.where(has, 0.5 * (t_min + t_max), table.cur_t)
    oldest = jnp.where(has, t_min, table.last_update_t)
    return mid, oldest


def _patch_abs_coords(center):
    """[(S²), 2] absolute image coords of the rect pixels for a center [2]."""
    r = jnp.arange(ps.PATCH_SIDE, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(r, r)  # gx varies along columns (x)
    tl = center - ps.PATCH_EXTENT
    return jnp.stack([gx.ravel() + tl[0], gy.ravel() + tl[1]], axis=-1)


# Local gradient-window side for the MXU bicubic sampler. The SE(2) warp is
# rigid, so every warped rect pixel lies within PATCH_EXTENT·√2 ≈ 18 px of
# the warped center; 64 leaves ≥ 14 px of slack plus the 2-px bicubic
# support, and 64 is MXU/VPU lane-width friendly.
GRAD_WINDOW = 64

# INPUT dtype of the sampler's MXU contraction (accumulation and all
# intermediates stay f32 via preferred_element_type — a non-f32 choice is
# input-only). bfloat16 inputs run the K=64 contraction at twice the f32
# systolic rate, but the rounding does not commute between the analytic and
# autodiff derivative paths (each rounds dtaps·du at a different point), so
# the analytic Jacobian drifts up to ~10% relative from autodiff — and the
# measured end-to-end speed/quality trade did not earn the cut (A/B in
# PRECISION.json, "sampler_mxu_dtype"). The default is therefore exact f32,
# matching the reference's f64-everywhere stance (optimizer.cpp:102-114)
# within f32; set EVO_SAMPLE_MXU_DTYPE=bfloat16 before import to opt in.
_SAMPLE_MXU_CHOICES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}
_sample_mxu_env = os.environ.get("EVO_SAMPLE_MXU_DTYPE", "float32")
if _sample_mxu_env not in _SAMPLE_MXU_CHOICES:
    raise ValueError(
        f"EVO_SAMPLE_MXU_DTYPE={_sample_mxu_env!r} is not a valid sampler "
        f"MXU dtype; allowed values: {sorted(_SAMPLE_MXU_CHOICES)}"
    )
SAMPLE_MXU_DTYPE = _SAMPLE_MXU_CHOICES[_sample_mxu_env]

# A solve's gradient window is anchored at the initial warp; the warped
# rect (corner radius PATCH_EXTENT*sqrt(2) ~ 17 px) plus bicubic support
# (2 px) plus origin rounding (0.5 px) leaves GRAD_WINDOW/2 - 19.5 ~ 12.5
# px of slack. Cumulative in-solve travel of the warped center is capped
# below that so every accepted iterate samples a fully-supported window —
# without the cap, a runaway step can leave the window while staying
# "in image", zero every tap, and collapse the cost to ~0.26 < the 0.6
# LOST threshold (a silent spurious optimum).
MAX_SOLVE_TRAVEL = 12.0


def slice_grad_window(grad2, se2, center):
    """(win [2, G, G], ox, oy) — the GRAD_WINDOW² local window of `grad2`
    around the SE(2)-warped `center`, origin clamped to the image. The
    integer origin has zero tangent (round/int32): the solve's derivatives
    flow through the tap weights, not the slice origin."""
    h, w = grad2.shape[1], grad2.shape[2]
    c = lie.se2_apply(se2, center)
    ox = jnp.clip(jnp.round(c[0]).astype(jnp.int32) - GRAD_WINDOW // 2, 0, w - GRAD_WINDOW)
    oy = jnp.clip(jnp.round(c[1]).astype(jnp.int32) - GRAD_WINDOW // 2, 0, h - GRAD_WINDOW)
    win = jax.lax.dynamic_slice(
        grad2, (0, oy, ox), (2, GRAD_WINDOW, GRAD_WINDOW)
    )
    return win, ox, oy


def _sample_grad_win(win, ox, oy, h, w, se2, center,
                     with_derivs: bool = False, taps: str = "cubic"):
    """Sample both gradient channels of a pre-sliced GRAD_WINDOW² window
    (`slice_grad_window`) at the SE(2)-warped rect pixels of `center` — the
    hot sampling step of the alignment residual.

    TPU formulation: dense Catmull-Rom tap-matrix contractions
    (kernels.interp.cubic_taps) — MXU matmuls instead of the 16-way random
    gather Ceres' BiCubicInterpolator does per sample (optimizer_cost.h:
    10-13), which on TPU lowers to serial gathers ~1000× slower. The store
    is channel-major [2, H, W]: a trailing channel dim of 2 would land in
    the TPU lane dimension and waste 126/128 of every vector register.
    Taking the window as an INPUT lets the LM solve slice it once per solve
    instead of once per while-loop trip: under vmap the per-lane
    dynamic_slice lowers to P serialized tiny kernels (~1.5 ms per 128-lane
    batch on v5e) — re-slicing inside the loop body dominated the whole
    solve before this split.

    Returns (gx [(S²)], gy [(S²)], wpts [(S²), 2], inb [(S²)] bool).
    """
    pts = _patch_abs_coords(center)
    wpts = lie.se2_apply(se2, pts)
    inb = (
        (wpts[:, 0] >= 0.0) & (wpts[:, 0] < w)
        & (wpts[:, 1] >= 0.0) & (wpts[:, 1] < h)
    )
    if not with_derivs:
        tap_fn = interp.linear_taps if taps == "linear" else interp.cubic_taps
        ty = tap_fn(wpts[:, 1] - oy.astype(wpts.dtype), GRAD_WINDOW)
        tx = tap_fn(wpts[:, 0] - ox.astype(wpts.dtype), GRAD_WINDOW)
    else:
        # fused value+derivative tap builds share d/|d|/sign per axis —
        # the tap construction is the VPU bottleneck of the linearize
        ty, lyd = interp.cubic_taps_vd(wpts[:, 1] - oy.astype(wpts.dtype),
                                       GRAD_WINDOW)
        tx, lxd = interp.cubic_taps_vd(wpts[:, 0] - ox.astype(wpts.dtype),
                                       GRAD_WINDOW)
    # fold both channels into the matmul lane dim: [S, 2S] keeps the MXU
    # N-dimension at 128 (two separate [·, S] matmuls would each pad S=64
    # lanes up to 128 and waste half the array)
    win_hm = jnp.transpose(win, (1, 0, 2)).reshape(GRAD_WINDOW, 2 * GRAD_WINDOW)
    # MXU inputs in SAMPLE_MXU_DTYPE, f32 accumulate and f32 store: bf16
    # inputs double the systolic-array rate and halve operand bandwidth of
    # the solve's hot matmul, while preferred_element_type=f32 keeps the
    # [(S²), 2G] intermediates exact w.r.t. the rounded inputs. Storing tmp
    # in bf16 as well (a second rounding) was tried and reverted: the
    # analytic and autodiff derivative paths round that second step
    # differently and drift ~5-10% apart (round-3 regression).
    md = SAMPLE_MXU_DTYPE
    win_md = win_hm.astype(md)
    tmp = jnp.einsum("nh,hm->nm", ty.astype(md), win_md,
                     preferred_element_type=jnp.float32)
    gx = jnp.sum(tx * tmp[:, :GRAD_WINDOW], axis=-1)
    gy = jnp.sum(tx * tmp[:, GRAD_WINDOW:], axis=-1)
    if not with_derivs:
        return gx, gy, wpts, inb
    # spatial derivatives of the interpolant via derivative taps — ONE extra
    # matmul (tmpd) + row-dots, vs a forward-mode pass that materializes a
    # [T, N, S] tangent tensor per patch
    tmpd = jnp.einsum("nh,hm->nm", lyd.astype(md), win_md,
                      preferred_element_type=jnp.float32)
    gx_x = jnp.sum(lxd * tmp[:, :GRAD_WINDOW], axis=-1)
    gy_x = jnp.sum(lxd * tmp[:, GRAD_WINDOW:], axis=-1)
    gx_y = jnp.sum(tx * tmpd[:, :GRAD_WINDOW], axis=-1)
    gy_y = jnp.sum(tx * tmpd[:, GRAD_WINDOW:], axis=-1)
    return gx, gy, wpts, inb, (gx_x, gy_x, gx_y, gy_y)


def _sample_grad_pair(grad2, se2, center, with_derivs: bool = False,
                      taps: str = "cubic"):
    """slice_grad_window + _sample_grad_win, re-slicing at the CURRENT warp
    — the one-shot sampling entry for everything outside the LM loop
    (budget update, predicted nabla, cost map, the plain residual)."""
    win, ox, oy = slice_grad_window(grad2, se2, center)
    return _sample_grad_win(
        win, ox, oy, grad2.shape[1], grad2.shape[2], se2, center,
        with_derivs=with_derivs, taps=taps,
    )


def alignment_residual(params5, data):
    """Residual vector [(S²)] for one patch.

    params5 = [se2(4), flow(1)]; data = (norm_int [(S²)], grad2 [2, H, W],
    center [2]).
    """
    norm_int, grad, center = data
    se2 = params5[0:4]
    flow = params5[4]
    gx, gy, wpts, inb = _sample_grad_pair(grad, se2, center)
    pred = gx * jnp.cos(flow) + gy * jnp.sin(flow)
    pred = jnp.where(inb, pred, 0.0)
    norm_pred = jnp.sqrt(1e-5 + jnp.sum(pred * pred))
    return jnp.where(inb, pred / norm_pred + norm_int, 0.0)


def _retract5(x, d):
    """SE2 right-plus on the warp + additive flow angle (tangent dim 4)."""
    return jnp.concatenate([lie.se2_retract(x[0:4], d[0:3]), x[4:5] + d[3:4]])


def _linearize_win_core(params5, norm_int, win, ox, oy, h, w, center):
    """Analytic (r [(S²)], J [(S²), 4]) of the alignment residual at d = 0
    of `_retract5` against a pre-sliced gradient window — exactly what
    autodiff computes, for ~5x less device work: forward-mode through the
    sampling matmuls materializes a [tangents, points, window] tensor per
    patch per LM iteration (HBM-bound); here the Jacobian needs one
    derivative-tap matmul plus [points, 4]-sized chain-rule arithmetic. The
    geometry tangents d(W·exp(δ)·a)/dδ still come from `jax.jacfwd`, but
    only through the cheap 2D point warp.
    """
    se2 = params5[0:4]
    flow = params5[4]
    gx, gy, wpts, inb, (gx_x, gy_x, gx_y, gy_y) = _sample_grad_win(
        win, ox, oy, h, w, se2, center, with_derivs=True
    )
    cosf, sinf = jnp.cos(flow), jnp.sin(flow)
    pred = jnp.where(inb, gx * cosf + gy * sinf, 0.0)
    dpdx = gx_x * cosf + gy_x * sinf
    dpdy = gx_y * cosf + gy_y * sinf

    # tangents of the warped points under the SE(2) retraction (cheap: only
    # the 2D point map, no image sampling inside)
    pts = _patch_abs_coords(center)
    dw = jax.jacfwd(
        lambda d3: lie.se2_apply(lie.se2_retract(se2, d3), pts)
    )(jnp.zeros(3, pts.dtype))  # [(S²), 2, 3]
    j_se2 = dpdx[:, None] * dw[:, 0, :] + dpdy[:, None] * dw[:, 1, :]
    j_flow = (-gx * sinf + gy * cosf)[:, None]
    jp = jnp.where(
        inb[:, None], jnp.concatenate([j_se2, j_flow], axis=-1), 0.0
    )  # [(S²), 4]

    s2 = 1e-5 + jnp.sum(pred * pred)
    s = jnp.sqrt(s2)
    r = jnp.where(inb, pred / s + norm_int, 0.0)
    # d(pred/s)/dδ = J/s − pred · (predᵀ J) / s³
    j = jp / s - pred[:, None] * (pred @ jp)[None, :] / (s2 * s)
    return r, j


def alignment_linearize(params5, data):
    """`_linearize_win_core` with the window sliced at the current warp —
    data = (norm_int, grad2 [2, H, W], center), the full-image signature."""
    norm_int, grad2, center = data
    win, ox, oy = slice_grad_window(grad2, params5[0:4], center)
    return _linearize_win_core(
        params5, norm_int, win, ox, oy, grad2.shape[1], grad2.shape[2], center
    )


@lru_cache(maxsize=None)
def _win_solve_fns(h, w):
    """(residual_fn, linearize_fn) over the pre-sliced-window data layout
    (norm_int, win, ox, oy, center); h/w are the full-image bounds for the
    in-image mask. Cached so lm_solve's jit cache sees stable identities."""

    def residual(params5, data):
        norm_int, win, ox, oy, center = data
        se2 = params5[0:4]
        flow = params5[4]
        gx, gy, wpts, inb = _sample_grad_win(win, ox, oy, h, w, se2, center)
        pred = gx * jnp.cos(flow) + gy * jnp.sin(flow)
        pred = jnp.where(inb, pred, 0.0)
        norm_pred = jnp.sqrt(1e-5 + jnp.sum(pred * pred))
        return jnp.where(inb, pred / norm_pred + norm_int, 0.0)

    def linearize(params5, data):
        norm_int, win, ox, oy, center = data
        return _linearize_win_core(
            params5, norm_int, win, ox, oy, h, w, center
        )

    return residual, linearize


def _warped_center_travel(params5, params0, data):
    """Distance (px) the SE(2)-warped patch center has moved from its value
    at the solve's start — the anchored window's travel metric. Module-level
    (not a per-call closure) so lm_solve's static-arg jit cache stays warm."""
    center = data[4]
    c_new = lie.se2_apply(params5[0:4], center)
    c_0 = lie.se2_apply(params0[0:4], center)
    return jnp.linalg.norm(c_new - c_0)


def _solve_one(params5, data, active=None):
    # slice the gradient window ONCE per solve, anchored at the initial
    # warp: under vmap a per-lane dynamic_slice lowers to P serialized tiny
    # kernels, and paying that on every while-loop trip dominated the whole
    # solve (device trace: ~70% of the scan in slice/update microkernels).
    # Within-solve travel is ~1-2 px against the window's ~12.5 px slack, so
    # anchoring at x0 samples identically to per-trip re-slicing; the
    # travel_fn cap below makes that an invariant rather than a typical-case
    # assumption (steps that would out-travel the window are rejected, so
    # the zero-tap region outside the window can never masquerade as a
    # low-cost optimum).
    norm_int, grad2, center = data
    win, ox, oy = slice_grad_window(grad2, params5[0:4], center)
    residual_fn, linearize_fn = _win_solve_fns(
        grad2.shape[1], grad2.shape[2]
    )
    res = lm_solve(
        residual_fn,
        params5,
        (norm_int, win, ox, oy, center),
        retract=_retract5,
        tangent_dim=4,
        num_iters=MAX_LM_ITERS,
        block_size=ps.PATCH_SIDE * ps.PATCH_SIDE,
        huber_delta=HUBER,
        init_lambda=1e-4,
        linearize_fn=linearize_fn,
        # trust region: a single LM step may move the patch by at most half
        # its extent, so the solver cannot teleport the patch out of the
        # image (where all residuals are zeroed => spurious global optimum)
        max_step=float(ps.PATCH_EXTENT) / 2.0,
        active=active,
        travel_fn=_warped_center_travel,
        max_travel=MAX_SOLVE_TRAVEL,
        # each patch re-solves every ~10 ms of stream from a warm start, so
        # late sub-1e-4-relative improvements are recovered one sub-batch
        # later for free; at Ceres' 1e-6 virtually every lane ran the full
        # 10 iterations (measured: 71/83 lanes at the cap), the batched
        # while_loop exits at the LAST lane, and the wasted trips were the
        # scan's largest cost. Quality A/B in PRECISION.json
        # ("alignment_ftol").
        ftol=ALIGN_FTOL,
    )
    return res.x, 0.5 * res.cost  # Ceres' final_cost convention


def _budget_one(grad, se2, flow, center):
    """Adaptive event budget of one patch: L1 norm of the warped,
    flow-projected gradients over the current rect, x0.6
    (feature_detector.cpp:678-712). Bilinear taps: the budget is a clamped
    heuristic — px-level sampling accuracy is ample (the reference reads
    the gradient image with OpenCV bilinear access), and the hat-function
    build is ~3x cheaper VPU work than the cubic pair."""
    gx, gy, _, _ = _sample_grad_pair(grad, se2, center, taps="linear")
    return jnp.sum(jnp.abs(0.6 * (gx * jnp.cos(flow) + gy * jnp.sin(flow))))


def update_budgets_solved(table: ps.PatchTable, grad, ran):
    """Budget + border-lost update for the lanes that JUST SOLVED — the
    reference's exact cadence: `updateNumOfEvents(patch)` runs right after
    that patch's optimize (updatePatches, feature_detector.cpp:611-616),
    never for the others. Running it full-width every scan step (the old
    path) recomputed identical budgets for unsolved lanes — a patch's
    budget is a pure function of state that only changes at its own solve
    or at a detection frame (which refreshes all budgets via
    update_num_of_events) — and that redundant sampling was ~1 ms of every
    scan step. The solved set is compacted to a 13/16-capacity batch
    (solves never exceed the live cap) so the sampling runs at the narrow
    width; an over-full fallback keeps correctness for exotic configs."""
    h, w = grad.shape[1], grad.shape[2]
    cx, cy = table.center[:, 0], table.center[:, 1]
    lost_border = 5
    border_lost = ran & (
        (cx <= lost_border) | (cy <= lost_border)
        | (cx >= w - lost_border) | (cy >= h - lost_border)
    )
    tl = table.center - ps.PATCH_EXTENT
    rect_oob = (
        (tl[:, 0] < 0) | (tl[:, 1] < 0)
        | (tl[:, 0] + ps.PATCH_SIDE >= w) | (tl[:, 1] + ps.PATCH_SIDE >= h)
    )
    rb = max(1, (table.capacity * 13) // 16)
    n_ran = jnp.sum(ran)

    def _compact(_):
        order = jnp.argsort(~ran)
        idx = order[:rb]
        act = ran[idx]
        raw = jax.vmap(_budget_one, in_axes=(None, 0, 0, 0))(
            grad, table.warp[idx], table.flow[idx], table.center[idx]
        )
        budget = jnp.clip(
            raw.astype(jnp.int32), ps.MIN_NUM_EVENTS, ps.MAX_NUM_EVENTS
        )
        budget = jnp.where(rect_oob[idx], ps.INIT_NUM_EVENTS, budget)
        return table.num_of_events.at[idx].set(
            jnp.where(act, budget, table.num_of_events[idx])
        )

    def _full(_):
        raw = jax.vmap(_budget_one, in_axes=(None, 0, 0, 0))(
            grad, table.warp, table.flow, table.center
        )
        budget = jnp.clip(
            raw.astype(jnp.int32), ps.MIN_NUM_EVENTS, ps.MAX_NUM_EVENTS
        )
        budget = jnp.where(rect_oob, ps.INIT_NUM_EVENTS, budget)
        return jnp.where(ran, budget, table.num_of_events)

    def _run(_):
        return jax.lax.cond(n_ran <= rb, _compact, _full, None)

    noe = jax.lax.cond(
        n_ran > 0, _run, lambda _: table.num_of_events, None
    )
    return dataclasses.replace(
        table,
        alive=table.alive & ~border_lost,
        num_of_events=noe,
    )


def update_num_of_events(table: ps.PatchTable, grad, lost_border: int = 5):
    """Batched `FeatureDetector::updateNumOfEvents`
    (feature_detector.cpp:666-712): border-lost check, then event budget
    from the warped flow-projected gradient L1 norm (×0.6), clamped.
    `grad` [2, H, W] is the *latest* detection frame's gradient pair."""
    h, w = grad.shape[1], grad.shape[2]
    cx, cy = table.center[:, 0], table.center[:, 1]
    border_lost = (
        (cx <= lost_border) | (cy <= lost_border)
        | (cx >= w - lost_border) | (cy >= h - lost_border)
    )
    tl = table.center - ps.PATCH_EXTENT
    rect_oob = (
        (tl[:, 0] < 0) | (tl[:, 1] < 0)
        | (tl[:, 0] + ps.PATCH_SIDE >= w) | (tl[:, 1] + ps.PATCH_SIDE >= h)
    )

    raw = jax.vmap(_budget_one, in_axes=(None, 0, 0, 0))(
        grad, table.warp, table.flow, table.center
    )
    budget = jnp.clip(raw.astype(jnp.int32), ps.MIN_NUM_EVENTS, ps.MAX_NUM_EVENTS)
    new_budget = jnp.where(
        rect_oob, ps.INIT_NUM_EVENTS, budget
    ).astype(jnp.int32)
    apply = table.alive & ~border_lost
    return dataclasses.replace(
        table,
        alive=table.alive & ~border_lost,
        num_of_events=jnp.where(apply, new_budget, table.num_of_events),
    )


@jax.jit
def optimize_ready_patches(table: ps.PatchTable, grads: jax.Array):
    """Run the alignment solve for every ready patch and apply the
    reference's post-solve updates. `grads` [SLOTS, 2, H, W] is the
    gradient-frame store; each patch samples its own birth-frame slot.

    Returns (new_table, info dict with per-patch cost / ran mask / lost).
    """
    ready = ps.is_ready(table) & table.alive & table.initialized

    integrated = integrate_events(table)  # [P, S, S]
    frob = jnp.sqrt(jnp.sum(integrated**2, axis=(1, 2))) + 1e-12
    norm_int = (integrated / frob[:, None, None]).reshape(table.capacity, -1)

    params0 = jnp.concatenate([table.warp, table.flow[:, None]], axis=-1)

    # skip the whole solve batch (and the [P, 2, H, W] gradient gather) when
    # no patch is ready — the common case between bursts; the reference's
    # per-event walk pays nothing when `isReady` is false (updatePatches,
    # feature_detector.cpp:611-616)
    n_ready = jnp.sum(ready)
    # compact solve width: gathering the ready lanes into a narrower batch
    # shrinks the per-LM-iteration sampling matmuls and the [R, 2, H, W]
    # gradient gather — the scan's dominant cost. Results are EXACT: lanes
    # are compacted by stable sort (ready-first, original order preserved),
    # solved, and scattered back. TWO tiers: half-capacity for the steady
    # trickle, 13/16-capacity for the common dense-scene case where most of
    # the table is ready at once (live never exceeds the 100-patch cap, so
    # the full-width path only serves exotic configurations).
    r1 = max(1, table.capacity // 2)
    r2 = max(r1, (table.capacity * 13) // 16)

    def _run_compact(r_lanes):
        def go(_):
            order = jnp.argsort(~ready)  # stable: ready first, in order
            idx = order[:r_lanes]
            act = ready[idx]
            new_p, cost_c = jax.vmap(_solve_one)(
                params0[idx],
                (norm_int[idx], grads[table.grad_slot[idx]], table.center[idx]),
                act,
            )
            new_params = params0.at[idx].set(
                jnp.where(act[:, None], new_p, params0[idx])
            )
            cost = (params0[:, 0] * 0.0).at[idx].set(
                jnp.where(act, cost_c, 0.0)
            )
            return new_params, cost

        return go

    def _run_full(_):
        grad_per_patch = grads[table.grad_slot]  # [P, 2, H, W]
        # non-ready lanes are marked inactive: their results are discarded
        # below, and the batched while_loop in lm_solve iterates until the
        # LAST live lane converges — letting stale-ring lanes iterate on
        # garbage would gate every scan step's solve at max trip count
        return jax.vmap(_solve_one)(
            params0, (norm_int, grad_per_patch, table.center), ready
        )

    def _run(_):
        return jax.lax.cond(
            n_ready <= r1,
            _run_compact(r1),
            lambda __: jax.lax.cond(
                n_ready <= r2, _run_compact(r2), _run_full, None
            ),
            None,
        )

    def _skip(_):
        # derive the zero cost from params0 so its varying-manual-axes type
        # matches the solve branch under shard_map
        return params0, params0[:, 0] * 0.0

    new_params, cost = jax.lax.cond(jnp.any(ready), _run, _skip, None)

    mid_t, oldest_t = batch_timestamps(table)

    # roll final-cost history and compute median-of-5 lost filter
    hist = jnp.where(
        ready[:, None],
        jnp.concatenate([table.final_costs[:, 1:], cost[:, None]], axis=1),
        table.final_costs,
    )
    n_costs = table.n_costs + ready.astype(jnp.int32)
    med = jnp.median(hist, axis=1)
    lost = ready & (n_costs >= 5) & (med > LOST_COST_THRESHOLD)

    upd = ready & ~lost
    warp_new = jnp.where(upd[:, None], new_params[:, 0:4], table.warp)
    flow_new = jnp.where(upd, jnp.mod(new_params[:, 4], 2.0 * jnp.pi), table.flow)
    # rect center = warp^{-1} · init_pt (patch.cpp:49-63)
    center_new = lie.se2_apply(lie.se2_inverse(warp_new), table.init_pt)
    center_new = jnp.where(upd[:, None], center_new, table.center)
    delta = jnp.linalg.norm(center_new - table.center, axis=-1)
    twu = TIME_WITHOUT_UPDATE_SCALE / jnp.maximum(0.1, delta)

    new_table = dataclasses.replace(
        table,
        alive=table.alive & ~lost,
        warp=warp_new,
        flow=flow_new,
        center=center_new,
        counter=jnp.where(ready, 0, table.counter),  # resetBatch
        final_costs=hist,
        n_costs=n_costs,
        cur_t=jnp.where(ready, mid_t, table.cur_t),
        last_update_t=jnp.where(ready, oldest_t, table.last_update_t),
        time_without_update=jnp.where(upd, twu, table.time_without_update),
    )
    info = dict(ran=ready, cost=cost, lost=lost, integrated=integrated)
    return new_table, info


@jax.jit
def process_window_scan(table: ps.PatchTable, grads: jax.Array,
                        ex, ey, et, ep, mask, latest_grad):
    """Process a whole frame window in ONE device dispatch: `lax.scan` over
    K event sub-batches, each step routing events and running the batched
    alignment solve + budget update — the production event path (the
    per-sub-batch host loop in detector.process_events costs one host→device
    round trip per sub-batch, which dominates on remote-attached TPUs).

    ex, ey, et, ep: [K, C] sub-batched events; mask [K, C] validity;
    latest_grad [2, H, W] = newest detection frame's gradients (budget
    update input). Returns (table', stacked per-step info dict with
    ran/cost/lost [K, P] and center [K, P, 2]).
    """

    def step(tbl, inp):
        bx, by, bt, bp_, bm = inp
        tbl = ps.route_events(tbl, bx, by, bt, bp_, bm)
        tbl, info = optimize_ready_patches(tbl, grads)
        # budget + border-lost for the JUST-SOLVED lanes only — the
        # reference's exact cadence (updateNumOfEvents right after each
        # patch's optimize, updatePatches:611-616); unsolved lanes cannot
        # have moved, so their budgets are unchanged by construction
        tbl = update_budgets_solved(tbl, latest_grad, info["ran"])
        out = dict(ran=info["ran"], cost=info["cost"], lost=info["lost"],
                   center=tbl.center, cur_t=tbl.cur_t,
                   alive=tbl.alive, track_id=tbl.track_id)
        return tbl, out

    table, stacked = jax.lax.scan(step, table, (ex, ey, et, ep, mask))
    return table, stacked


def predicted_nabla(table: ps.PatchTable, grads: jax.Array):
    """[P, S, S] predicted gradient patches −(g(W·a)·(cosφ, sinφ)) — the
    visualization/debug quantity of `Patch::warpImage` (patch.cpp:139-160)."""
    grad_per_patch = grads[table.grad_slot]

    def one(se2, flow, center, grad):
        gx, gy, _, _ = _sample_grad_pair(grad, se2, center)
        out = -(gx * jnp.cos(flow) + gy * jnp.sin(flow))
        return out.reshape(ps.PATCH_SIDE, ps.PATCH_SIDE)

    return jax.vmap(one)(table.warp, table.flow, table.center, grad_per_patch)


def cost_map(table: ps.PatchTable, grads: jax.Array, patch_idx: int,
             half_width: int = 5):
    """Brute-force alignment-cost map over integer translations of one
    patch's warp — the reference's debugging cost map
    (`Optimizer::drawCostMap`, optimizer.cpp:32-60; 11x11 default from
    `optimizer.h:21-22` costMapWidth/Height). Returns [(2h+1), (2h+1)]."""
    integrated = integrate_events(table)[patch_idx]
    frob = jnp.sqrt(jnp.sum(integrated**2)) + 1e-12
    norm_int = (integrated / frob).reshape(-1)
    grad = grads[table.grad_slot[patch_idx]]
    center = table.center[patch_idx]
    base = jnp.concatenate([table.warp[patch_idx], table.flow[patch_idx][None]])
    offs = jnp.arange(-half_width, half_width + 1, dtype=jnp.float32)
    ox, oy = jnp.meshgrid(offs, offs)

    def cost_at(dx, dy):
        p = base.at[2].add(dx).at[3].add(dy)
        r = alignment_residual(p, (norm_int, grad, center))
        s = jnp.sum(r * r)
        n = jnp.sqrt(s + 1e-12)
        rho = jnp.where(n <= HUBER, s, 2.0 * HUBER * n - HUBER * HUBER)
        return 0.5 * rho

    return jax.vmap(jax.vmap(cost_at))(ox, oy)


def motion_compensated_integration(table: ps.PatchTable, prev_traj_pt, prev_traj_t):
    """[P, S, S] per-patch translational motion-compensated integration
    (`Patch::integrateMotionCompensatedEvents`, patch.cpp:87-130): each event
    is shifted along the segment between the last two trajectory points
    proportionally to its time offset from the batch midpoint."""
    t, x, y, p_sign, valid = ps.newest_events(table)
    mid_t, _ = batch_timestamps(table)
    dirv = table.center - prev_traj_pt  # [P, 2]
    t_dif = jnp.maximum(table.cur_t - prev_traj_t, 1e-6)  # [P]
    shift = (mid_t[:, None] - t) / t_dif[:, None]  # [P, E]
    cx = x + shift * dirv[:, 0:1]
    cy = y + shift * dirv[:, 1:2]
    tlx = table.center[:, 0] - ps.PATCH_EXTENT
    tly = table.center[:, 1] - ps.PATCH_EXTENT
    # truncation toward zero matches the reference's Point2i cast
    rx = jnp.trunc(cx - tlx[:, None])
    ry = jnp.trunc(cy - tly[:, None])
    inside = (
        (rx >= 0) & (rx < ps.PATCH_SIDE) & (ry >= 0) & (ry < ps.PATCH_SIDE)
    )
    w = jnp.where(valid & inside, p_sign, 0.0)
    return _nearest_sep_splat(rx, ry, w)
