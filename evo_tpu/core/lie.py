"""Differentiable Lie groups: SO(2)/SE(2), SO(3)/SE(3), Sim(3).

TPU-native replacement for the reference's Sophus dependency
(`common/include/common/geometry.h:5-15`, local parameterizations at
`implementation/feature_tracker/include/feature_tracker/local_parameterization_se2.hpp`
and `implementation/visual_odometry/include/visual_odometry/local_parameterization_se3.hpp`).

Design: pure functions over flat parameter vectors, fully traceable and
`vmap`/`grad`-compatible. No hand-written plus-Jacobians are needed — our LM
solver (evo_tpu.solve.lm) linearizes residuals in the tangent space via
`jax.jacfwd` of `r(retract(x, delta))` at `delta = 0`, which is exactly the
role Ceres' `LocalParameterization::ComputeJacobian` plays in the reference.

Storage conventions
-------------------
SE2  : [4]  (cos θ, sin θ, tx, ty)           tangent [3] = (vx, vy, ω)
quat : [4]  (w, x, y, z), unit norm
SE3  : [7]  (qw, qx, qy, qz, tx, ty, tz)     tangent [6] = (vx, vy, vz, ωx, ωy, ωz)
Sim3 : [8]  (s, qw, qx, qy, qz, tx, ty, tz)

Tangent ordering (translation first, rotation last) matches Sophus, so the
reference's retraction `T * exp(δ)` carries over verbatim.

All small-angle branches use the "double-where" trick so both the value and
the gradient are NaN-free at θ = 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _safe_div(num, den, eps=_EPS):
    """num/den with a NaN-free gradient at den == 0 (returns num/eps there)."""
    safe = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
    return num / safe


# ---------------------------------------------------------------------------
# SO(2) / SE(2)
# ---------------------------------------------------------------------------


def so2_from_angle(theta):
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def se2_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def se2_from_parts(theta, t):
    """SE2 from rotation angle and translation [2]."""
    return jnp.concatenate(
        [jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1), t], axis=-1
    )


def se2_angle(g):
    return jnp.arctan2(g[..., 1], g[..., 0])


def se2_translation(g):
    return g[..., 2:4]


def se2_rotate(g, v):
    """Apply only the rotation part to points v [..., 2]."""
    c, s = g[..., 0:1], g[..., 1:2]
    return jnp.concatenate(
        [c * v[..., 0:1] - s * v[..., 1:2], s * v[..., 0:1] + c * v[..., 1:2]],
        axis=-1,
    )


def se2_apply(g, v):
    """g · v for points v [..., 2]."""
    return se2_rotate(g, v) + g[..., 2:4]


def se2_compose(a, b):
    """a · b."""
    ca, sa = a[..., 0], a[..., 1]
    cb, sb = b[..., 0], b[..., 1]
    c = ca * cb - sa * sb
    s = sa * cb + ca * sb
    t = se2_rotate(a, b[..., 2:4]) + a[..., 2:4]
    return jnp.concatenate([jnp.stack([c, s], axis=-1), t], axis=-1)


def se2_inverse(g):
    c, s = g[..., 0], g[..., 1]
    ginv_rot = jnp.stack([c, -s], axis=-1)
    t = g[..., 2:4]
    tinv = jnp.stack([-(c * t[..., 0] + s * t[..., 1]), -(-s * t[..., 0] + c * t[..., 1])], axis=-1)
    return jnp.concatenate([ginv_rot, tinv], axis=-1)


def se2_exp(xi):
    """exp: tangent [.., 3] = (vx, vy, ω) → SE2 [.., 4]."""
    v = xi[..., 0:2]
    theta = xi[..., 2]
    th2 = theta * theta
    small = th2 < 1e-10
    # V = [[sinθ/θ, -(1-cosθ)/θ], [(1-cosθ)/θ, sinθ/θ]]
    a = jnp.where(small, 1.0 - th2 / 6.0, _safe_div(jnp.sin(theta), theta))
    b = jnp.where(small, theta / 2.0 - th2 * theta / 24.0, _safe_div(1.0 - jnp.cos(theta), theta))
    t = jnp.stack(
        [a * v[..., 0] - b * v[..., 1], b * v[..., 0] + a * v[..., 1]], axis=-1
    )
    return jnp.concatenate(
        [jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1), t], axis=-1
    )


def se2_log(g):
    """log: SE2 [.., 4] → tangent [.., 3]."""
    theta = se2_angle(g)
    th2 = theta * theta
    small = th2 < 1e-10
    a = jnp.where(small, 1.0 - th2 / 6.0, _safe_div(jnp.sin(theta), theta))
    b = jnp.where(small, theta / 2.0, _safe_div(1.0 - jnp.cos(theta), theta))
    # invert V (det = a² + b²)
    det = a * a + b * b
    t = g[..., 2:4]
    vx = _safe_div(a * t[..., 0] + b * t[..., 1], det)
    vy = _safe_div(-b * t[..., 0] + a * t[..., 1], det)
    return jnp.stack([vx, vy, theta], axis=-1)


def se2_retract(g, delta):
    """Right-plus g · exp(δ) — matches the reference's Ceres local param
    (`local_parameterization_se2.hpp:19-26`: `T * exp(δ)`)."""
    return se2_compose(g, se2_exp(delta))


# ---------------------------------------------------------------------------
# Quaternions / SO(3)
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate points v [..., 3] by unit quaternion q [..., 4]."""
    qv = q[..., 1:4]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., 0:1] * uv + uuv)


def quat_to_matrix(q):
    """Unit quaternion [..,4] → rotation matrix [..,3,3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def quat_from_matrix(m):
    """Rotation matrix [..,3,3] → unit quaternion [..,4] (w>=0 branch-free).

    Uses the 4-candidate trace method evaluated branchlessly so it is safe
    under vmap/jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate quats (unnormalized), one per dominant diagonal term.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..,4cand,4]
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = quat_normalize(q)
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def so3_exp(w):
    """so(3) [..,3] → unit quaternion [..,4]."""
    th2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(th2 + _EPS * _EPS)  # strictly positive, grad-safe
    half = 0.5 * theta
    small = th2 < 1e-10
    k = jnp.where(small, 0.5 - th2 / 48.0, _safe_div(jnp.sin(half), theta))
    wq = w * k[..., None]
    return jnp.concatenate([jnp.cos(half)[..., None], wq], axis=-1)


def so3_log(q):
    """Unit quaternion [..,4] → so(3) [..,3] (angle in (-π, π])."""
    w = q[..., 0]
    v = q[..., 1:4]
    vn = jnp.linalg.norm(v, axis=-1)
    # Handle double cover: force w >= 0
    sign = jnp.where(w < 0, -1.0, 1.0)
    w, v, vn = w * sign, v * sign[..., None], vn
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-7
    k = jnp.where(small, 2.0 / jnp.clip(w, 1e-7), _safe_div(theta, vn))
    return v * k[..., None]


def so3_hat(w):
    """[..,3] → skew matrix [..,3,3]."""
    zeros = jnp.zeros_like(w[..., 0])
    rows = jnp.stack(
        [
            zeros, -w[..., 2], w[..., 1],
            w[..., 2], zeros, -w[..., 0],
            -w[..., 1], w[..., 0], zeros,
        ],
        axis=-1,
    )
    return rows.reshape(w.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


def se3_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def se3_from_parts(q, t):
    return jnp.concatenate([q, t], axis=-1)


def se3_rotation(g):
    return g[..., 0:4]


def se3_translation(g):
    return g[..., 4:7]


def se3_apply(g, v):
    return quat_rotate(g[..., 0:4], v) + g[..., 4:7]


def se3_compose(a, b):
    q = quat_normalize(quat_mul(a[..., 0:4], b[..., 0:4]))
    t = quat_rotate(a[..., 0:4], b[..., 4:7]) + a[..., 4:7]
    return jnp.concatenate([q, t], axis=-1)


def se3_inverse(g):
    qi = quat_conj(g[..., 0:4])
    ti = -quat_rotate(qi, g[..., 4:7])
    return jnp.concatenate([qi, ti], axis=-1)


def _se3_v_coeffs(th2):
    """Coefficients (B, C) with V = I + B [w]ₓ + C [w]ₓ² (grad-safe)."""
    theta = jnp.sqrt(th2 + _EPS * _EPS)
    small = th2 < 1e-10
    b = jnp.where(small, 0.5 - th2 / 24.0, _safe_div(1.0 - jnp.cos(theta), th2))
    c = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, _safe_div(theta - jnp.sin(theta), th2 * theta))
    return b, c


def se3_exp(xi):
    """se(3) [..,6] = (v, ω) → SE3 [..,7]."""
    v, w = xi[..., 0:3], xi[..., 3:6]
    q = so3_exp(w)
    th2 = jnp.sum(w * w, axis=-1)
    b, c = _se3_v_coeffs(th2)
    wx = so3_hat(w)
    wxv = jnp.einsum("...ij,...j->...i", wx, v)
    wxwxv = jnp.einsum("...ij,...j->...i", wx, wxv)
    t = v + b[..., None] * wxv + c[..., None] * wxwxv
    return jnp.concatenate([q, t], axis=-1)


def se3_log(g):
    """SE3 [..,7] → se(3) [..,6]."""
    w = so3_log(g[..., 0:4])
    t = g[..., 4:7]
    th2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(th2 + _EPS * _EPS)
    small = th2 < 1e-10
    # V⁻¹ = I − ½[w]ₓ + D [w]ₓ², D = (1 − θcos(θ/2)/(2sin(θ/2)))/θ²
    half = 0.5 * theta
    cot_term = _safe_div(half * jnp.cos(half), jnp.sin(half))
    d = jnp.where(small, 1.0 / 12.0 + th2 / 720.0, _safe_div(1.0 - cot_term, th2))
    wx = so3_hat(w)
    wxt = jnp.einsum("...ij,...j->...i", wx, t)
    wxwxt = jnp.einsum("...ij,...j->...i", wx, wxt)
    v = t - 0.5 * wxt + d[..., None] * wxwxt
    return jnp.concatenate([v, w], axis=-1)


def se3_retract(g, delta):
    """Right-plus g · exp(δ) — matches `local_parameterization_se3.hpp:40-46`."""
    return se3_compose(g, se3_exp(delta))


def se3_interpolate(a, b, alpha):
    """Geodesic interpolation a · exp(α log(a⁻¹ b)) — the reference's GT sync
    interpolation (`visual_odometry.cpp:549-558`)."""
    rel = se3_compose(se3_inverse(a), b)
    return se3_compose(a, se3_exp(alpha * se3_log(rel)))


def se3_to_matrix(g):
    """SE3 [..,7] → homogeneous matrix [..,4,4]."""
    r = quat_to_matrix(g[..., 0:4])
    t = g[..., 4:7]
    top = jnp.concatenate([r, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=g.dtype), g.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(m):
    return jnp.concatenate([quat_from_matrix(m[..., :3, :3]), m[..., :3, 3]], axis=-1)


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------


def sim3_identity(dtype=jnp.float32):
    return jnp.array([1.0, 1.0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def sim3_from_parts(s, q, t):
    return jnp.concatenate([jnp.asarray(s)[..., None], q, t], axis=-1)


def sim3_apply(g, v):
    """g · v = s R v + t."""
    return g[..., 0:1] * quat_rotate(g[..., 1:5], v) + g[..., 5:8]


def sim3_compose(a, b):
    s = a[..., 0] * b[..., 0]
    q = quat_normalize(quat_mul(a[..., 1:5], b[..., 1:5]))
    t = a[..., 0:1] * quat_rotate(a[..., 1:5], b[..., 5:8]) + a[..., 5:8]
    return jnp.concatenate([s[..., None], q, t], axis=-1)


def sim3_inverse(g):
    si = 1.0 / g[..., 0]
    qi = quat_conj(g[..., 1:5])
    ti = -si[..., None] * quat_rotate(qi, g[..., 5:8])
    return jnp.concatenate([si[..., None], qi, ti], axis=-1)


def sim3_mul_se3(sim, se3):
    """Sim3 × SE3 → SE3 with scaled translation — the reference's custom
    `operator*(Sim3, SE3)` used to map estimated poses into the GT frame
    (`visual_odometry.cpp:24-35`)."""
    q = quat_normalize(quat_mul(sim[..., 1:5], se3[..., 0:4]))
    t = sim[..., 0:1] * quat_rotate(sim[..., 1:5], se3[..., 4:7]) + sim[..., 5:8]
    return jnp.concatenate([q, t], axis=-1)
