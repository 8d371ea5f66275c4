"""Compensated-accumulation precision tests (SURVEY §7 hard part 6).

The reference runs Ceres in f64; the TPU build is f32 with an optional
two-float compensated path. These tests measure the option against a
NumPy-f64 oracle on reduction depths where plain f32 scatter-adds visibly
drift.
"""

import numpy as np
import jax.numpy as jnp

from evo_tpu.solve import epipolar, precision
from evo_tpu.vo import ba


class TestCompensatedScatter:
    def test_matches_f64_oracle_where_naive_drifts(self):
        """Mixed-magnitude values into few slots: the compensated result must
        stay within a few ulp of the f64 oracle and beat the naive chain."""
        rng = np.random.default_rng(0)
        O, n_out = 200_000, 4
        idx = rng.integers(0, n_out, O).astype(np.int32)
        # lognormal magnitudes with random signs: worst case for a long
        # sequential f32 chain
        vals = (rng.lognormal(0.0, 4.0, O) * rng.choice([-1, 1], O)).astype(
            np.float32
        )
        oracle = np.zeros(n_out)
        np.add.at(oracle, idx, vals.astype(np.float64))

        comp = np.asarray(
            precision._csa_jit(jnp.asarray(idx), jnp.asarray(vals), n_out, 32)
        )
        naive = np.asarray(
            jnp.zeros(n_out, jnp.float32).at[jnp.asarray(idx)].add(
                jnp.asarray(vals)
            )
        )
        scale = np.abs(oracle) + np.abs(vals.astype(np.float64)).sum() * 1e-12
        err_comp = np.max(np.abs(comp - oracle) / scale)
        err_naive = np.max(np.abs(naive - oracle) / scale)
        # error bounded by chunk depth, not total depth: distinctly better
        # than the naive O-long chain and small in absolute terms
        assert err_comp < err_naive / 3
        assert err_comp < 5e-6

    def test_block_shape_and_padding(self):
        rng = np.random.default_rng(1)
        O, n_out = 101, 7  # non-divisible by chunk count -> exercises padding
        idx = jnp.asarray(rng.integers(0, n_out, O), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(O, 6, 6)), jnp.float32)
        out = precision.compensated_scatter_add(idx, vals, n_out, n_chunks=8)
        oracle = np.zeros((n_out, 6, 6), np.float64)
        np.add.at(oracle, np.asarray(idx), np.asarray(vals, np.float64))
        np.testing.assert_allclose(np.asarray(out), oracle, rtol=2e-6, atol=1e-6)


class TestRefinedNullVector:
    def test_beats_f32_svd_floor(self):
        """On a rank-8 system the refined null vector's residual must not be
        worse than the plain f32 SVD's, and should recover most of the gap to
        the f64 answer."""
        rng = np.random.default_rng(2)
        worse = better = 0
        for trial in range(10):
            e_true = rng.normal(size=9)
            e_true /= np.linalg.norm(e_true)
            B = rng.normal(size=(300, 9))
            A64 = B - np.outer(B @ e_true, e_true)  # exact null vector e_true
            A = jnp.asarray(A64, jnp.float32)
            _, _, vt = jnp.linalg.svd(A, full_matrices=True)
            e_svd = np.asarray(vt[-1], np.float64)
            e_ref = np.asarray(precision.refined_null_vector(A), np.float64)
            r_svd = np.linalg.norm(np.asarray(A, np.float64) @ e_svd)
            r_ref = np.linalg.norm(np.asarray(A, np.float64) @ e_ref)
            if r_ref <= r_svd * 1.05:
                better += 1
            else:
                worse += 1
        assert better >= 9, (better, worse)

    def test_eight_point_refine_null_option(self):
        """eight_point(refine_null=True) still recovers the right essential
        matrix geometry on clean correspondences."""
        rng = np.random.default_rng(3)
        from evo_tpu.core import lie

        q = np.array([0.995, 0.06, 0.05, 0.04])
        q /= np.linalg.norm(q)
        t = np.array([0.6, -0.2, 0.1])
        t /= np.linalg.norm(t)
        pose_2_1 = jnp.asarray(np.concatenate([q, t]), jnp.float32)
        pts = np.stack(
            [rng.uniform(-1, 1, 40), rng.uniform(-1, 1, 40), rng.uniform(3, 6, 40)],
            -1,
        )
        f1 = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        p2 = np.asarray(lie.se3_apply(pose_2_1, jnp.asarray(pts, jnp.float32)))
        f2 = p2 / np.linalg.norm(p2, axis=-1, keepdims=True)
        E = epipolar.eight_point(
            jnp.asarray(f1, jnp.float32), jnp.asarray(f2, jnp.float32),
            refine_null=True,
        )
        res = np.asarray(epipolar.epipolar_residual(E, jnp.asarray(f1, jnp.float32),
                                                    jnp.asarray(f2, jnp.float32)))
        assert np.max(res) < 1e-4


class TestBaCompensated:
    def _problem(self, rng, F=6, L=40, O=400):
        from evo_tpu.core import camera, lie
        from evo_tpu.core.types import CalibParams

        calib = CalibParams(fx=100.0, fy=100.0, cx=120.0, cy=90.0,
                            width=240, height=180)
        intr = jnp.asarray(calib.to_array())
        poses = np.tile([1.0, 0, 0, 0, 0, 0, 0], (F, 1)).astype(np.float32)
        poses[:, 4] = np.arange(F) * 0.05
        pts = np.stack(
            [rng.uniform(-1, 1, L), rng.uniform(-1, 1, L), rng.uniform(3, 5, L)],
            -1,
        ).astype(np.float32)
        of = rng.integers(0, F, O).astype(np.int32)
        ol = rng.integers(0, L, O).astype(np.int32)
        import jax

        p_cam = lie.se3_apply(
            jax.vmap(lie.se3_inverse)(jnp.asarray(poses))[of], jnp.asarray(pts)[ol]
        )
        op = np.asarray(camera.project(intr, p_cam)) + rng.normal(0, 0.3, (O, 2))
        om = np.ones(O, bool)
        fixed = np.zeros(F, bool)
        fixed[:2] = True
        return (jnp.asarray(poses), jnp.asarray(pts), intr, jnp.asarray(of),
                jnp.asarray(ol), jnp.asarray(op, jnp.float32), jnp.asarray(om),
                jnp.asarray(fixed))

    def test_compensated_matches_plain_and_converges(self):
        rng = np.random.default_rng(4)
        args = self._problem(rng)
        p1, l1, c1, c01, _ = ba.ba_solve(*args, num_iters=15)
        p2, l2, c2, c02, _ = ba.ba_solve(*args, num_iters=15, compensated=True)
        # both reduce cost and agree to f32 working precision
        assert float(c1) < float(c01) and float(c2) < float(c02)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=5e-3)
        assert abs(float(c1) - float(c2)) / max(float(c1), 1.0) < 5e-2
