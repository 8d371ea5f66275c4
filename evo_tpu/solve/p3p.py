"""Perspective-3-Point absolute pose solver (Grunert's method).

Replaces OpenGV's Kneip P3P used for keyframe localization
(`visual_odometry.cpp:243-254`, `AbsolutePoseSacProblem::KNEIP`). The TPU
redesign avoids the reference's per-hypothesis early-exit loops: the quartic
is solved with a fixed-size sign-change grid + bisection + Newton polish
(branch-free, vmappable), and all four candidate poses are returned with a
validity mask — RANSAC scores every candidate in parallel instead of
disambiguating (SURVEY.md §7 hard part 3).

Math (Grunert 1841, coefficients per Haralick et al. 1994 review):
given unit rays j1, j2, j3 to world points P1, P2, P3, the distance ratios
v = s3/s1 satisfy a quartic; back-substitution gives camera-frame points and
a 3-point Kabsch alignment yields the pose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from evo_tpu.core import lie

_N_GRID = 256
_V_MAX = 16.0
# 24 halvings shrink the widest possible bracket (~16) to ~1e-6; the Newton
# polish then reaches f32 resolution. Both loops are UNROLLED: under
# vmap-over-hypotheses each trip is a tiny [H, 4] op, and a lax.fori_loop's
# per-trip overhead (~80 µs on the host geometry backend) made the root
# finder the dominant cost of the whole localization RANSAC (4.5 ms of a
# 5.1 ms dispatch at 128 hypotheses).
_N_BISECT = 24
_N_NEWTON = 6


def _quartic_real_roots(coeffs):
    """Real positive roots of A4 v^4 + A3 v^3 + A2 v^2 + A1 v + A0 in
    (0, _V_MAX], found by sign-change bracketing on a fixed grid followed by
    bisection and Newton polishing. Returns (roots [4], valid [4])."""
    A4, A3, A2, A1, A0 = coeffs

    def f(v):
        return (((A4 * v + A3) * v + A2) * v + A1) * v + A0

    def fp(v):
        return ((4.0 * A4 * v + 3.0 * A3) * v + 2.0 * A2) * v + A1

    # geometric-ish grid: denser near small ratios
    g = jnp.linspace(0.0, 1.0, _N_GRID, dtype=A4.dtype)
    grid = 1e-4 + (_V_MAX - 1e-4) * g * g
    vals = f(grid)
    sign_change = jnp.signbit(vals[:-1]) != jnp.signbit(vals[1:])  # [N-1]
    # take up to 4 bracket indices (smallest first): k-th True located by
    # argmax over (sign_change & rank==k+1) — a stable argsort of the [N-1]
    # mask did the same job but cost 2.6 ms of the 5 ms localization
    # dispatch at 128 vmapped hypotheses (XLA:CPU sorts row-serially)
    rank = jnp.cumsum(sign_change)
    idx = jnp.stack(
        [jnp.argmax(sign_change & (rank == k + 1)) for k in range(4)]
    )
    have = sign_change[idx]
    lo = grid[idx]
    hi = grid[idx + 1]

    def bisect_body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        same_side = jnp.signbit(f(mid)) == jnp.signbit(f(lo))
        lo = jnp.where(same_side, mid, lo)
        hi = jnp.where(same_side, hi, mid)
        return lo, hi

    for i in range(_N_BISECT):  # unrolled — see _N_BISECT note
        lo, hi = bisect_body(i, (lo, hi))
    root = 0.5 * (lo + hi)

    def newton_body(_, r):
        d = fp(r)
        step = f(r) / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        r2 = r - step
        ok = (r2 > 0) & (r2 <= _V_MAX) & jnp.isfinite(r2)
        return jnp.where(ok, r2, r)

    for i in range(_N_NEWTON):  # unrolled
        root = newton_body(i, root)
    valid = have & (root > 0) & jnp.isfinite(root)
    return root, valid


def _kabsch_3pt(p_world, p_cam):
    """Rigid T_c_w (p_cam = R p_world + t) from 3 EXACT correspondences by
    orthonormal-triad alignment. A batched 3×3 SVD Kabsch computed the same
    rotation, but vmapped jnp.linalg.svd lowers to one LAPACK call per
    matrix on the host geometry backend — 512 of them made this the
    dominant cost of the entire localization RANSAC dispatch. P3P
    back-substitution yields exact correspondences, so the triad
    construction is equivalent (degenerate only for collinear points, where
    P3P itself is degenerate and the candidate scores out)."""

    def triad(p):
        u1 = p[1] - p[0]
        u1 = u1 / jnp.maximum(jnp.linalg.norm(u1), 1e-12)
        v = p[2] - p[0]
        v = v - jnp.dot(v, u1) * u1
        u2 = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u3 = jnp.cross(u1, u2)
        return jnp.stack([u1, u2, u3], axis=1)  # orthonormal columns

    W = triad(p_world)
    C = triad(p_cam)
    R = C @ W.T  # right-handed triads both sides ⇒ proper rotation
    cw = jnp.mean(p_world, axis=0)
    cc = jnp.mean(p_cam, axis=0)
    t = cc - R @ cw
    return R, t


def _solve3_cramer(J, r):
    """x with J x = r via Cramer's rule (scalar triple products) — a
    vmapped jnp.linalg.solve pays a LAPACK round trip per 3×3 system."""
    c0, c1, c2 = J[:, 0], J[:, 1], J[:, 2]
    det = jnp.dot(c0, jnp.cross(c1, c2))
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    x0 = jnp.dot(r, jnp.cross(c1, c2))
    x1 = jnp.dot(c0, jnp.cross(r, c2))
    x2 = jnp.dot(c0, jnp.cross(c1, r))
    return jnp.stack([x0, x1, x2]) / det


def p3p_grunert(bearings, points):
    """Solve P3P.

    Parameters
    ----------
    bearings : [3, 3] unit rays in the camera frame.
    points : [3, 3] world points.

    Returns
    -------
    poses_w_c : [4, 7] candidate camera poses (T_w_c, world-from-camera).
    valid : [4] bool mask.
    """
    j1, j2, j3 = bearings[0], bearings[1], bearings[2]
    P1, P2, P3 = points[0], points[1], points[2]
    a2 = jnp.sum((P2 - P3) ** 2)  # a^2 (opposite vertex 1)
    b2 = jnp.sum((P1 - P3) ** 2)  # b^2 (opposite vertex 2)
    c2 = jnp.sum((P1 - P2) ** 2)  # c^2 (opposite vertex 3)
    # Scale normalization: work with unit-ish triangle sides so the quartic
    # is well conditioned in f32; distances rescale at the end.
    scale2 = jnp.maximum((a2 + b2 + c2) / 3.0, 1e-12)
    scale = jnp.sqrt(scale2)
    a2, b2, c2 = a2 / scale2, b2 / scale2, c2 / scale2
    ca = jnp.sum(j2 * j3)  # cos(alpha)
    cb = jnp.sum(j1 * j3)  # cos(beta)
    cg = jnp.sum(j1 * j2)  # cos(gamma)

    b2s = jnp.where(b2 < 1e-12, 1e-12, b2)
    amc = (a2 - c2) / b2s
    apc = (a2 + c2) / b2s
    bmc = (b2 - c2) / b2s
    bma = (b2 - a2) / b2s

    A4 = (amc - 1.0) ** 2 - 4.0 * (c2 / b2s) * ca * ca
    A3 = 4.0 * (
        amc * (1.0 - amc) * cb
        - (1.0 - apc) * ca * cg
        + 2.0 * (c2 / b2s) * ca * ca * cb
    )
    A2 = 2.0 * (
        amc * amc
        - 1.0
        + 2.0 * amc * amc * cb * cb
        + 2.0 * bmc * ca * ca
        - 4.0 * apc * ca * cb * cg
        + 2.0 * bma * cg * cg
    )
    A1 = 4.0 * (
        -amc * (1.0 + amc) * cb
        + 2.0 * (a2 / b2s) * cg * cg * cb
        - (1.0 - apc) * ca * cg
    )
    A0 = (1.0 + amc) ** 2 - 4.0 * (a2 / b2s) * cg * cg

    v, v_valid = _quartic_real_roots((A4, A3, A2, A1, A0))  # [4]

    # u = s2/s1 from the rational relation (Grunert back-substitution)
    denom = 2.0 * (cg - v * ca)
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    u = ((-1.0 + amc) * v * v - 2.0 * amc * cb * v + 1.0 + amc) / denom

    s1sq = b2 / jnp.maximum(1.0 + v * v - 2.0 * v * cb, 1e-12)
    s1 = jnp.sqrt(s1sq) * scale  # undo the normalization
    s2 = u * s1
    s3 = v * s1
    dist_valid = v_valid & (s1 > 0) & (s2 > 0) & (s3 > 0)

    # Newton polish of (s1, s2, s3) on the three law-of-cosines residuals —
    # removes quartic back-substitution error (f32 conditioning).
    a2s, b2s_, c2s = a2 * scale2, b2 * scale2, c2 * scale2

    def _polish(s):
        def res(s):
            s1_, s2_, s3_ = s
            return jnp.stack([
                s2_ * s2_ + s3_ * s3_ - 2.0 * s2_ * s3_ * ca - a2s,
                s1_ * s1_ + s3_ * s3_ - 2.0 * s1_ * s3_ * cb - b2s_,
                s1_ * s1_ + s2_ * s2_ - 2.0 * s1_ * s2_ * cg - c2s,
            ])

        def body(_, s):
            r = res(s)
            J = jax.jacfwd(res)(s)
            step = _solve3_cramer(J + 1e-9 * jnp.eye(3, dtype=s.dtype), r)
            s_new = s - step
            ok = jnp.all(jnp.isfinite(s_new)) & jnp.all(s_new > 0)
            return jnp.where(ok, s_new, s)

        for i in range(3):  # unrolled (tiny body)
            s = body(i, s)
        return s

    s_polished = jax.vmap(lambda a, b, c: _polish(jnp.stack([a, b, c])))(s1, s2, s3)
    s1, s2, s3 = s_polished[:, 0], s_polished[:, 1], s_polished[:, 2]

    p_world = jnp.stack([P1, P2, P3])  # [3, 3]

    def pose_for(si):
        s1_, s2_, s3_ = si
        p_cam = jnp.stack([s1_ * j1, s2_ * j2, s3_ * j3])
        R, t = _kabsch_3pt(p_world, p_cam)  # T_c_w
        q = lie.quat_from_matrix(R)
        pose_c_w = jnp.concatenate([q, t])
        return lie.se3_inverse(pose_c_w)  # T_w_c

    poses = jax.vmap(pose_for)(
        (s1, s2, s3)
    )  # [4, 7]
    finite = jnp.all(jnp.isfinite(poses), axis=-1)
    return poses, dist_valid & finite


def reprojection_angle_residual(pose_w_c, bearings, points):
    """1 - cos(angle) between observed bearings and predicted directions —
    the angular inlier statistic OpenGV RANSAC uses (reference threshold
    `1 - cos(atan2(3px, 200))`, visual_odometry.cpp:247-251).

    bearings [N,3] unit, points [N,3] world, pose_w_c [7]."""
    p_cam = lie.se3_apply(lie.se3_inverse(pose_w_c), points)
    norm = jnp.linalg.norm(p_cam, axis=-1, keepdims=True)
    pred = p_cam / jnp.maximum(norm, 1e-12)
    cos = jnp.sum(bearings * pred, axis=-1)
    return 1.0 - cos
