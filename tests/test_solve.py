"""Solver tests: LM recovery of known transforms, triangulation, 8-point,
P3P, RANSAC — the synthetic-forward/inverse-recovery pattern of the
reference's `optimizer_test.cpp:69-149` and `triangulation_test.cpp:5-23`."""

import jax
import jax.numpy as jnp
import numpy as np

from evo_tpu.core import lie
from evo_tpu.solve import epipolar, p3p, ransac, triangulate
from evo_tpu.solve.lm import lm_solve, lm_solve_batched


class TestLM:
    def test_linear_least_squares_exact(self, rng):
        # LM on a linear problem converges in one accepted step
        A = jnp.asarray(rng.standard_normal((20, 4)), jnp.float32)
        x_true = jnp.asarray(rng.standard_normal(4), jnp.float32)
        b = A @ x_true

        res = lm_solve(lambda x, d: A @ x - b, jnp.zeros(4), num_iters=5)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_true), atol=1e-4)
        assert float(res.cost) < 1e-8

    def test_rosenbrock(self):
        # classic nonlinear test: residuals (10(y-x^2), 1-x)
        def f(x, d):
            return jnp.array([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

        res = lm_solve(f, jnp.array([-1.2, 1.0]), num_iters=40)
        np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-3)

    def test_huber_rejects_outliers(self, rng):
        # estimate a scalar mean with 30% gross outliers
        inl = rng.standard_normal(70) * 0.05 + 3.0
        out = np.full(30, 50.0)
        y = jnp.asarray(np.concatenate([inl, out]), jnp.float32)

        res = lm_solve(lambda x, d: y - x[0], jnp.zeros(1), num_iters=25, huber_delta=0.5)
        # Huber bounds (not zeroes) outlier influence: the exact M-estimate is
        # x = 3 + 30·delta/70 ≈ 3.214, vs ~17.1 for the unrobust mean.
        assert abs(float(res.x[0]) - 3.0) < 0.3
        ls = lm_solve(lambda x, d: y - x[0], jnp.zeros(1), num_iters=25)
        assert abs(float(ls.x[0]) - 17.1) < 0.3

    def test_se3_manifold_recovery(self, rng):
        # recover a known SE(3) transform from noiseless point pairs
        g_true = lie.se3_exp(jnp.asarray(rng.standard_normal(6) * 0.3, jnp.float32))
        pts = jnp.asarray(rng.standard_normal((30, 3)), jnp.float32)
        target = lie.se3_apply(g_true, pts)

        def res_fn(g, d):
            return (lie.se3_apply(g, pts) - target).ravel()

        out = lm_solve(
            res_fn, lie.se3_identity(), retract=lie.se3_retract, tangent_dim=6,
            num_iters=20,
        )
        np.testing.assert_allclose(
            np.asarray(lie.se3_apply(out.x, pts)), np.asarray(target), atol=1e-3
        )

    def test_batched_solves(self, rng):
        # vmap over 32 independent linear problems
        A = jnp.asarray(rng.standard_normal((32, 10, 3)), jnp.float32)
        x_true = jnp.asarray(rng.standard_normal((32, 3)), jnp.float32)
        b = jnp.einsum("bij,bj->bi", A, x_true)

        def res_fn(x, data):
            Ai, bi = data
            return Ai @ x - bi

        out = lm_solve_batched(res_fn, jnp.zeros((32, 3)), (A, b), num_iters=5)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(x_true), atol=1e-3)

    def test_masked_residuals(self, rng):
        # masked (zeroed) residuals must not influence the solution
        y = jnp.asarray(np.concatenate([np.full(50, 2.0), np.full(50, 99.0)]), jnp.float32)
        mask = jnp.asarray(np.concatenate([np.ones(50), np.zeros(50)]), jnp.float32)
        res = lm_solve(lambda x, d: (y - x[0]) * mask, jnp.zeros(1), num_iters=10)
        np.testing.assert_allclose(float(res.x[0]), 2.0, atol=1e-4)


class TestTriangulation:
    def test_analytic_point(self):
        # the reference's triangulation_test: two bearings, known pose,
        # expect (1, 0, 0) — cam2 translated along z... we build our own:
        p_w = jnp.array([1.0, 0.0, 5.0])
        pose_w_1 = lie.se3_identity()
        pose_w_2 = lie.se3_from_parts(lie.quat_identity(), jnp.array([0.5, 0.0, 0.0]))
        f1 = p_w / jnp.linalg.norm(p_w)
        p_c2 = lie.se3_apply(lie.se3_inverse(pose_w_2), p_w)
        f2 = p_c2 / jnp.linalg.norm(p_c2)
        pt, (d1, d2) = triangulate.triangulate_midpoint(
            f1[None], f2[None], lie.se3_compose(lie.se3_inverse(pose_w_1), pose_w_2)
        )
        np.testing.assert_allclose(np.asarray(pt[0]), [1.0, 0.0, 5.0], atol=1e-4)
        assert float(d1[0]) > 0 and float(d2[0]) > 0

    def test_world_frame_batch(self, rng):
        pts = jnp.asarray(rng.uniform(-1, 1, (50, 3)) + [0, 0, 4.0], jnp.float32)
        pose_w_1 = lie.se3_exp(jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32))
        pose_w_2 = lie.se3_compose(
            pose_w_1, lie.se3_exp(jnp.array([0.4, 0.1, 0.0, 0.02, -0.03, 0.01], jnp.float32))
        )

        def bearings(pose):
            pc = lie.se3_apply(lie.se3_inverse(pose), pts)
            return pc / jnp.linalg.norm(pc, axis=-1, keepdims=True)

        out, _ = triangulate.triangulate_landmarks(
            bearings(pose_w_1), bearings(pose_w_2), pose_w_1, pose_w_2
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-2)


def _synthetic_two_view(rng, n=64, noise=0.0):
    pts = jnp.asarray(
        np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)],
            axis=-1,
        ),
        jnp.float32,
    )
    pose_1_2 = lie.se3_exp(
        jnp.array([0.3, -0.1, 0.05, 0.04, 0.06, -0.03], jnp.float32)
    )  # cam2 in cam1

    def unit(v):
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    f1 = unit(pts)
    f2 = unit(lie.se3_apply(lie.se3_inverse(pose_1_2), pts))
    if noise > 0:
        f1 = unit(f1 + jnp.asarray(rng.standard_normal(f1.shape) * noise, jnp.float32))
        f2 = unit(f2 + jnp.asarray(rng.standard_normal(f2.shape) * noise, jnp.float32))
    return pts, pose_1_2, f1, f2


class TestEpipolar:
    def test_eight_point_recovers_pose(self, rng):
        pts, pose_1_2, f1, f2 = _synthetic_two_view(rng)
        E = epipolar.eight_point(f1, f2)
        r = epipolar.epipolar_residual(E, f1, f2)
        # f32 SVD null-space precision bounds the linear solution at ~1e-3;
        # downstream VO refines nonlinearly (refine_absolute_pose / BA).
        assert float(jnp.max(r)) < 5e-3
        pose_est, n_good = epipolar.decompose_essential(E, f1, f2)
        # rotation must match; translation up to scale
        np.testing.assert_allclose(
            np.asarray(pose_est[0:4]), np.asarray(pose_1_2[0:4]), atol=2e-2
        )
        t_true = np.array(pose_1_2[4:7])
        t_true /= np.linalg.norm(t_true)
        np.testing.assert_allclose(np.asarray(pose_est[4:7]), t_true, atol=5e-2)
        assert int(n_good) == pts.shape[0]


class TestP3P:
    def test_recovers_pose_noiseless(self, rng):
        for trial in range(5):
            pose_w_c = lie.se3_exp(
                jnp.asarray(rng.standard_normal(6) * 0.4, jnp.float32)
            )
            pts = jnp.asarray(
                np.stack(
                    [rng.uniform(-2, 2, 3), rng.uniform(-2, 2, 3), rng.uniform(3, 7, 3)],
                    axis=-1,
                ),
                jnp.float32,
            )
            p_w = lie.se3_apply(pose_w_c, pts)  # world points seen at `pts` in cam
            bearings = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
            poses, valid = p3p.p3p_grunert(bearings, p_w)
            assert bool(jnp.any(valid)), f"trial {trial}: no valid P3P root"
            # at least one candidate must reproduce the true pose
            errs = []
            for i in range(4):
                d = lie.se3_log(lie.se3_compose(lie.se3_inverse(poses[i]), pose_w_c))
                errs.append(float(jnp.linalg.norm(d)) if bool(valid[i]) else np.inf)
            assert min(errs) < 1e-2, f"trial {trial}: best err {min(errs)}"


class TestRansac:
    def test_relative_pose_with_outliers(self, rng):
        pts, pose_1_2, f1, f2 = _synthetic_two_view(rng, n=96, noise=0.0)
        # corrupt 30% of f2
        n_out = 28
        f2_np = np.array(f2)
        bad = rng.standard_normal((n_out, 3))
        f2_np[:n_out] = bad / np.linalg.norm(bad, axis=-1, keepdims=True)
        f2c = jnp.asarray(f2_np)
        key = jax.random.PRNGKey(0)
        # threshold 5e-5 (the reference's ransacThreshold) on the triangulated
        # angular statistic ~ 0.57 deg — tight enough to discriminate
        # translation direction even at moderate parallax
        pose_est, res = ransac.relative_pose_ransac(
            key, f1, f2c, jnp.asarray(96), num_hypotheses=256, threshold=5e-5
        )
        assert int(res.num_inliers) >= 60
        np.testing.assert_allclose(
            np.asarray(pose_est[0:4]), np.asarray(pose_1_2[0:4]), atol=3e-2
        )

    def test_absolute_pose_with_outliers(self, rng):
        pose_w_c = lie.se3_exp(jnp.asarray(rng.standard_normal(6) * 0.3, jnp.float32))
        n = 80
        pts_c = jnp.asarray(
            np.stack(
                [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(3, 8, n)],
                axis=-1,
            ),
            jnp.float32,
        )
        p_w = lie.se3_apply(pose_w_c, pts_c)
        bearings = np.array(pts_c / jnp.linalg.norm(pts_c, axis=-1, keepdims=True))
        # 25% outliers
        bad = rng.standard_normal((20, 3))
        bearings[:20] = bad / np.linalg.norm(bad, axis=-1, keepdims=True)
        key = jax.random.PRNGKey(1)
        pose_est, res = ransac.absolute_pose_ransac(
            key, jnp.asarray(bearings), p_w, jnp.asarray(n), num_hypotheses=256
        )
        assert int(res.num_inliers) >= 55
        d = lie.se3_log(lie.se3_compose(lie.se3_inverse(pose_est), pose_w_c))
        assert float(jnp.linalg.norm(d)) < 0.05
        # nonlinear refinement stays at/near the optimum (the minimal-sample
        # solve is already ~machine precision after Newton polish, so
        # refinement over all inliers can only match it to the f32 floor)
        refined = ransac.refine_absolute_pose(pose_est, jnp.asarray(bearings), p_w, res.inliers)
        d2 = lie.se3_log(lie.se3_compose(lie.se3_inverse(refined), pose_w_c))
        assert float(jnp.linalg.norm(d2)) < 5e-3
