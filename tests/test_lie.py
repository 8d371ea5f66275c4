"""Lie group tests: exp/log round trips, group axioms, interpolation.

Mirrors the role Sophus' own tests play for the reference; tolerances are
f32-appropriate. Seeds are fixed (SURVEY.md §4: fix seeds instead of loose
stochastic tolerances).
"""

import jax
import jax.numpy as jnp
import numpy as np

from evo_tpu.core import lie


def rnd(shape, rng, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)


class TestSE2:
    def test_exp_log_roundtrip(self, rng):
        xi = rnd((64, 3), rng)
        g = jax.vmap(lie.se2_exp)(xi)
        xi2 = jax.vmap(lie.se2_log)(g)
        np.testing.assert_allclose(xi, xi2, atol=1e-5)

    def test_exp_zero_is_identity(self):
        g = lie.se2_exp(jnp.zeros(3))
        np.testing.assert_allclose(g, lie.se2_identity(), atol=1e-7)

    def test_compose_inverse(self, rng):
        a = lie.se2_exp(rnd((3,), rng))
        ident = lie.se2_compose(a, lie.se2_inverse(a))
        np.testing.assert_allclose(ident, lie.se2_identity(), atol=1e-6)

    def test_apply_matches_matrix(self, rng):
        xi = rnd((3,), rng)
        g = lie.se2_exp(xi)
        th = lie.se2_angle(g)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        p = rnd((2,), rng)
        expect = R @ np.asarray(p) + np.asarray(lie.se2_translation(g))
        np.testing.assert_allclose(lie.se2_apply(g, p), expect, atol=1e-5)

    def test_grad_through_exp_at_zero(self):
        # NaN-free gradient at the identity (small-angle branch).
        f = lambda xi: jnp.sum(lie.se2_apply(lie.se2_exp(xi), jnp.ones(2)))
        g = jax.grad(f)(jnp.zeros(3))
        assert np.all(np.isfinite(g))


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        # rotations within the injectivity radius (|w| < pi)
        w = rnd((64, 3), rng, scale=0.8)
        q = jax.vmap(lie.so3_exp)(w)
        w2 = jax.vmap(lie.so3_log)(q)
        np.testing.assert_allclose(w, w2, atol=1e-5)

    def test_log_exp_group_roundtrip_large_angle(self, rng):
        # beyond pi, log wraps — but exp(log(q)) must reproduce the rotation
        w = rnd((16, 3), rng, scale=3.0)
        q = jax.vmap(lie.so3_exp)(w)
        q2 = jax.vmap(lie.so3_exp)(jax.vmap(lie.so3_log)(q))
        v = rnd((3,), rng)
        np.testing.assert_allclose(
            lie.quat_rotate(q, v), lie.quat_rotate(q2, v), atol=1e-5
        )

    def test_rotate_matches_matrix(self, rng):
        w = rnd((3,), rng)
        q = lie.so3_exp(w)
        R = lie.quat_to_matrix(q)
        v = rnd((3,), rng)
        np.testing.assert_allclose(lie.quat_rotate(q, v), R @ v, atol=1e-5)

    def test_matrix_quat_roundtrip(self, rng):
        w = rnd((32, 3), rng, scale=2.0)
        q = jax.vmap(lie.so3_exp)(w)
        R = lie.quat_to_matrix(q)
        q2 = lie.quat_from_matrix(R)
        # same rotation up to sign; quat_from_matrix forces w >= 0
        qpos = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
        np.testing.assert_allclose(qpos, q2, atol=1e-5)

    def test_small_angle_grad(self):
        f = lambda w: jnp.sum(lie.quat_rotate(lie.so3_exp(w), jnp.ones(3)))
        g = jax.grad(f)(jnp.zeros(3))
        assert np.all(np.isfinite(g))


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rnd((64, 6), rng)
        # keep rotation part within the injectivity radius (|w| < pi)
        xi = xi.at[:, 3:6].multiply(0.8)
        g = jax.vmap(lie.se3_exp)(xi)
        xi2 = jax.vmap(lie.se3_log)(g)
        np.testing.assert_allclose(xi, xi2, atol=2e-5)

    def test_compose_inverse(self, rng):
        a = lie.se3_exp(rnd((6,), rng))
        ident = lie.se3_compose(a, lie.se3_inverse(a))
        np.testing.assert_allclose(ident, lie.se3_identity(), atol=1e-6)

    def test_apply_consistency(self, rng):
        a = lie.se3_exp(rnd((6,), rng))
        b = lie.se3_exp(rnd((6,), rng))
        p = rnd((3,), rng)
        lhs = lie.se3_apply(lie.se3_compose(a, b), p)
        rhs = lie.se3_apply(a, lie.se3_apply(b, p))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_matrix_roundtrip(self, rng):
        g = lie.se3_exp(rnd((6,), rng))
        m = lie.se3_to_matrix(g)
        g2 = lie.se3_from_matrix(m)
        p = rnd((3,), rng)
        np.testing.assert_allclose(lie.se3_apply(g, p), lie.se3_apply(g2, p), atol=1e-5)

    def test_interpolate_endpoints_and_midpoint(self, rng):
        # Endpoints exact; midpoint lies on the geodesic — the GT-sync
        # behavior checked by the reference's visual_odometry_test.
        a = lie.se3_exp(rnd((6,), rng))
        b = lie.se3_exp(rnd((6,), rng))
        np.testing.assert_allclose(lie.se3_interpolate(a, b, 0.0), a, atol=1e-5)
        np.testing.assert_allclose(lie.se3_interpolate(a, b, 1.0), b, atol=1e-5)
        mid = lie.se3_interpolate(a, b, 0.5)
        rel_am = lie.se3_log(lie.se3_compose(lie.se3_inverse(a), mid))
        rel_ab = lie.se3_log(lie.se3_compose(lie.se3_inverse(a), b))
        np.testing.assert_allclose(rel_am, 0.5 * rel_ab, atol=1e-5)

    def test_retract_matches_compose_exp(self, rng):
        g = lie.se3_exp(rnd((6,), rng))
        d = rnd((6,), rng, scale=0.1)
        np.testing.assert_allclose(
            lie.se3_retract(g, d), lie.se3_compose(g, lie.se3_exp(d)), atol=1e-6
        )


class TestSim3:
    def test_compose_inverse(self, rng):
        q = lie.so3_exp(rnd((3,), rng))
        g = lie.sim3_from_parts(jnp.float32(1.7), q, rnd((3,), rng))
        ident = lie.sim3_compose(g, lie.sim3_inverse(g))
        np.testing.assert_allclose(ident, lie.sim3_identity(), atol=1e-5)

    def test_apply_scale(self, rng):
        g = lie.sim3_from_parts(jnp.float32(2.0), lie.quat_identity(), jnp.zeros(3))
        p = rnd((3,), rng)
        np.testing.assert_allclose(lie.sim3_apply(g, p), 2.0 * p, atol=1e-6)

    def test_mul_se3(self, rng):
        # Sim3 * SE3 action on a point == Sim3 · (SE3 · p) with scale folded in,
        # matching the reference's custom operator (visual_odometry.cpp:24-35).
        q = lie.so3_exp(rnd((3,), rng))
        sim = lie.sim3_from_parts(jnp.float32(1.5), q, rnd((3,), rng))
        se = lie.se3_exp(rnd((6,), rng))
        out = lie.sim3_mul_se3(sim, se)
        # translation: s R t + t_sim
        t_expect = 1.5 * lie.quat_rotate(q, lie.se3_translation(se)) + sim[5:8]
        np.testing.assert_allclose(lie.se3_translation(out), t_expect, atol=1e-5)
