"""Kernel tests: splat parity + differentiability, interpolation, warps,
Harris detection on synthetic corners, pyramidal LK on shifted images."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evo_tpu.kernels import gradients, harris, interp, lk, splat, warp
from evo_tpu.core import lie


class TestSplat:
    def test_matmul_matches_scatter_bilinear(self, rng):
        n = 500
        x = jnp.asarray(rng.uniform(0, 239, n), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 179, n), jnp.float32)
        w = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)
        a = splat.splat_image(x, y, w, 180, 240, mode="bilinear", chunk=128)
        b = splat.splat_image_scatter(x, y, w, 180, 240, mode="bilinear")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_mass_conservation_interior(self, rng):
        # bilinear taps sum to 1 for interior events
        n = 200
        x = jnp.asarray(rng.uniform(5, 230, n), jnp.float32)
        y = jnp.asarray(rng.uniform(5, 170, n), jnp.float32)
        w = jnp.ones(n, jnp.float32)
        img = splat.splat_image(x, y, w, 180, 240)
        np.testing.assert_allclose(float(jnp.sum(img)), n, rtol=1e-5)

    def test_gaussian_stamp_shape(self):
        img = splat.splat_image(
            jnp.array([20.0]), jnp.array([15.0]), jnp.array([1.0]),
            32, 40, mode="gaussian", sigma=1.0, radius=3, chunk=8,
        )
        img = np.asarray(img)
        assert img[15, 20] == pytest.approx(1.0, abs=1e-5)  # peak = exp(0)
        assert img[15, 21] == pytest.approx(np.exp(-0.5), abs=1e-5)
        assert img[16, 21] == pytest.approx(np.exp(-1.0), abs=1e-5)
        assert img[15, 24] == 0.0  # beyond radius 3

    def test_differentiable_wrt_positions(self):
        # gradient of a loss through the splat w.r.t. event x positions
        def loss(x):
            img = splat.splat_image(
                x, jnp.array([10.0, 12.0]), jnp.ones(2), 24, 24,
                mode="gaussian", chunk=8,
            )
            return jnp.sum(img * jnp.arange(24.0)[None, :])  # x-moment

        g = jax.grad(loss)(jnp.array([10.0, 15.0]))
        # moving an event right increases the x-moment -> gradient ~ +1
        assert np.all(np.asarray(g) > 0.5)

    def test_padding_masked_out(self):
        x = jnp.array([10.0, 10.0])
        y = jnp.array([10.0, 10.0])
        w = jnp.array([1.0, 0.0])  # second event masked
        img = splat.splat_image(x, y, w, 20, 20)
        np.testing.assert_allclose(float(jnp.sum(img)), 1.0, rtol=1e-6)


class TestInterp:
    def test_bilinear_exact_on_grid(self, rng):
        img = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)
        ys = jnp.array([3.0, 7.0])
        xs = jnp.array([2.0, 11.0])
        np.testing.assert_allclose(
            np.asarray(interp.bilinear(img, ys, xs)),
            np.asarray(img)[[3, 7], [2, 11]],
            atol=1e-6,
        )

    def test_bicubic_exact_on_grid(self, rng):
        img = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)
        ys = jnp.array([5.0])
        xs = jnp.array([6.0])
        np.testing.assert_allclose(
            float(interp.bicubic(img, ys, xs)[0]), float(img[5, 6]), atol=1e-5
        )

    def test_bicubic_reproduces_linear_ramp(self):
        # cubic interpolation is exact for linear functions
        ramp = jnp.arange(16.0)[None, :].repeat(16, 0)
        val = interp.bicubic(ramp, jnp.array([8.0]), jnp.array([5.3]))
        np.testing.assert_allclose(float(val[0]), 5.3, atol=1e-5)

    def test_gradients_smooth(self):
        img = jnp.asarray(np.outer(np.arange(16.0), np.arange(16.0)), jnp.float32)
        g = jax.grad(lambda x: interp.bicubic(img, jnp.array([7.5]), x)[0])(
            jnp.array([7.5])
        )
        # d/dx of (y*x) at y=7.5 is 7.5
        np.testing.assert_allclose(float(g[0]), 7.5, atol=0.1)

    def test_bicubic_mxu_matches_gather_interior(self, rng):
        """The MXU tap-matrix bicubic must agree with the gather bicubic for
        every interior point (same Catmull-Rom kernel, different schedule)."""
        img = jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
        ys = jnp.asarray(rng.uniform(2, 29, 64), jnp.float32)
        xs = jnp.asarray(rng.uniform(2, 29, 64), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(interp.bicubic_mxu(img, ys, xs)),
            np.asarray(interp.bicubic(img, ys, xs)),
            atol=1e-4,
        )
        # multi-channel variant
        img2 = jnp.stack([img, 2.0 * img], axis=-1)
        out2 = np.asarray(interp.bicubic_mxu(img2, ys, xs))
        np.testing.assert_allclose(out2[:, 1], 2.0 * out2[:, 0], atol=1e-4)

    def test_bicubic_mxu_gradients(self):
        img = jnp.asarray(np.outer(np.arange(16.0), np.arange(16.0)), jnp.float32)
        g = jax.grad(lambda x: interp.bicubic_mxu(img, jnp.array([7.5]), x)[0])(
            jnp.array([7.5])
        )
        np.testing.assert_allclose(float(g[0]), 7.5, atol=0.1)


class TestWarp:
    def test_identity_warp_recovers_patch(self, rng):
        img = jnp.asarray(rng.standard_normal((40, 40)), jnp.float32)
        out = warp.warp_patch_se2(img, lie.se2_identity(), jnp.array([20.0, 20.0]), 3)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(img)[17:24, 17:24], atol=1e-5
        )

    def test_translation_warp(self, rng):
        img = jnp.asarray(rng.standard_normal((40, 40)), jnp.float32)
        se2 = lie.se2_from_parts(jnp.float32(0.0), jnp.array([2.0, -1.0]))
        out = warp.warp_patch_se2(img, se2, jnp.array([20.0, 20.0]), 3)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(img)[16:23, 19:26], atol=1e-5
        )

    def test_rotation_90deg(self):
        # a quarter rotation maps the +x axis onto +y
        img = jnp.zeros((41, 41)).at[20, 30].set(1.0)  # point at center+(10,0)
        se2 = lie.se2_from_parts(jnp.float32(np.pi / 2), jnp.zeros(2))
        out = warp.warp_patch_se2(img, se2, jnp.array([20.0, 20.0]), 12)
        # output patch pixel p gets img(center + R p): p=(0,-10) maps to
        # center+(10*... ) — just check the peak lands 10 px off-center
        out = np.asarray(out)
        peak = np.unravel_index(np.argmax(out), out.shape)
        assert out[peak] > 0.9
        assert abs(np.hypot(peak[0] - 12, peak[1] - 12) - 10) < 0.6


def _squares_image():
    # isolated bright squares: L-corners with positive Harris response
    # (note: *ideal checkerboard* X-corners are saddles, det(M) < 0 —
    # Harris with a 3x3 block does not fire on them)
    img = np.zeros((160, 160), np.float32)
    for cy in range(24, 150, 32):
        for cx in range(24, 150, 32):
            img[cy : cy + 12, cx : cx + 12] = 1.0
    return jnp.asarray(img)


class TestHarris:
    def test_detects_square_corners(self):
        img = _squares_image()
        xy, score, valid = harris.detect_corners(
            img, max_corners=80, min_distance=8.0, border=10
        )
        assert int(jnp.sum(valid)) > 30
        xyv = np.asarray(xy)[np.asarray(valid)]
        # every detection lies exactly on a true square corner {c, c+11}
        truth = np.array([c + o for c in range(24, 150, 32) for o in (0, 11)])
        errx = np.abs(xyv[:, 0][:, None] - truth[None]).min(1).max()
        erry = np.abs(xyv[:, 1][:, None] - truth[None]).min(1).max()
        assert errx <= 1.0 and erry <= 1.0

    def test_min_distance_respected(self):
        img = _squares_image()
        xy, score, valid = harris.detect_corners(
            img, max_corners=60, min_distance=20.0, border=10
        )
        xyv = np.asarray(xy)[np.asarray(valid)]
        assert len(xyv) > 5
        d = np.linalg.norm(xyv[None] - xyv[:, None], axis=-1)
        np.fill_diagonal(d, 1e9)
        assert d.min() >= 20.0

    def test_flat_image_has_no_corners(self):
        xy, score, valid = harris.detect_corners(jnp.ones((64, 64)), max_corners=10)
        assert int(jnp.sum(valid)) == 0

    def test_fixpoint_nms_matches_serial_greedy(self):
        """The whole-vector suppression fixpoint must equal OpenCV's serial
        greedy pass (accept strongest, reject anything within min_distance
        of an accepted corner, in score order) on a busy natural image."""
        rng = np.random.default_rng(11)
        img = rng.random((120, 160)).astype(np.float32)
        img = np.asarray(
            jnp.asarray(img)
        )
        max_corners, min_d, border = 40, 9.0, 10
        xy, score, valid = harris.detect_corners(
            jnp.asarray(img), max_corners=max_corners,
            min_distance=min_d, border=border,
        )
        # serial greedy oracle over the same candidate pool
        resp = np.asarray(harris.harris_response(jnp.asarray(img), 3, 0.04))
        peak = np.asarray(
            resp >= np.asarray(harris._maxpool_same(jnp.asarray(resp), 3))
        )
        h, w = img.shape
        ys, xs = np.mgrid[0:h, 0:w]
        inb = ((xs >= border) & (xs < w - border)
               & (ys >= border) & (ys < h - border))
        qmax = resp[inb].max()
        good = peak & inb & (resp > 0.01 * qmax) & (resp > 0)
        scores = np.where(good, resp, -np.inf).ravel()
        order = np.argsort(-scores, kind="stable")[: 4 * max_corners]
        taken = []
        for idx in order:
            if not np.isfinite(scores[idx]) or len(taken) >= max_corners:
                continue
            cy, cx = divmod(idx, w)
            if all((cx - tx) ** 2 + (cy - ty) ** 2 >= min_d * min_d
                   for tx, ty in taken):
                taken.append((float(cx), float(cy)))
        got = [tuple(p) for p in np.asarray(xy)[np.asarray(valid)]]
        assert got == taken


class TestLK:
    def _textured(self, rng, h=96, w=96, sigma=2.0):
        img = rng.standard_normal((h, w)).astype(np.float32)
        img = np.asarray(
            gradients.gaussian_blur(jnp.asarray(img), sigma, radius=int(2 * sigma))
        )
        return img

    def test_recovers_pure_translation(self, rng):
        img0 = self._textured(rng)
        shift = (3.0, -2.0)  # (dx, dy)
        # img1(x) = img0(x - shift): sample img0 at x-shift
        ys, xs = np.meshgrid(np.arange(96.0), np.arange(96.0), indexing="ij")
        img1 = np.asarray(
            interp.bilinear(jnp.asarray(img0), jnp.asarray(ys - shift[1]), jnp.asarray(xs - shift[0]))
        )
        pts = jnp.asarray(rng.uniform(25, 70, (12, 2)), jnp.float32)
        new_pts, flow, status = lk.pyramidal_lk(
            jnp.asarray(img0), jnp.asarray(img1), pts, jnp.ones(12, bool)
        )
        ok = np.asarray(status)
        assert ok.sum() >= 10
        np.testing.assert_allclose(
            np.asarray(flow)[ok], np.tile(shift, (ok.sum(), 1)), atol=0.2
        )

    def test_large_displacement_needs_pyramid(self, rng):
        # texture correlation length must exceed the coarse-level shift for
        # the pyramid basin to capture it (sigma=4 => ~2.75 px at level 2)
        img0 = self._textured(rng, 128, 128, sigma=4.0)
        shift = (11.0, 7.0)
        ys, xs = np.meshgrid(np.arange(128.0), np.arange(128.0), indexing="ij")
        img1 = np.asarray(
            interp.bilinear(jnp.asarray(img0), jnp.asarray(ys - shift[1]), jnp.asarray(xs - shift[0]))
        )
        pts = jnp.asarray(rng.uniform(40, 90, (10, 2)), jnp.float32)
        _, flow, status = lk.pyramidal_lk(
            jnp.asarray(img0), jnp.asarray(img1), pts, jnp.ones(10, bool), num_levels=3
        )
        ok = np.asarray(status)
        assert ok.sum() >= 8
        med = np.median(np.asarray(flow)[ok], axis=0)
        np.testing.assert_allclose(med, shift, atol=0.5)

    def test_flat_region_fails_status(self):
        img = jnp.ones((64, 64))
        pts = jnp.array([[32.0, 32.0]])
        _, _, status = lk.pyramidal_lk(img, img, pts, jnp.ones(1, bool))
        assert not bool(status[0])

    def _blob(self, cx, cy, h=160, w=200, sigma=10.0):
        ys, xs = np.meshgrid(np.arange(float(h)), np.arange(float(w)),
                             indexing="ij")
        return np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma**2)
                      ).astype(np.float32)

    def test_travel_beyond_window_slack_is_flagged(self):
        """Boundary-motion guard (ADVICE r2): a single-level track whose
        iterate must travel past the target-window slack (LK_WINDOW/2 −
        radius − 1 px from the guess) samples clamped window edges — it must
        FAIL status rather than silently return a clamped estimate. A wide
        blob keeps the gradient basin large enough that the iterate really
        does run toward the far target."""
        slack = lk.LK_WINDOW // 2 - 10 - 1  # 21 px at radius=10
        img0 = self._blob(100.0, 80.0)
        img1 = self._blob(100.0 + slack + 8, 80.0)  # true shift 29 px
        pts = jnp.array([[100.0, 80.0]])
        _, flow, status = lk.pyramidal_lk(
            jnp.asarray(img0), jnp.asarray(img1), pts, jnp.ones(1, bool),
            num_levels=1,
        )
        assert not bool(status[0])

    def test_travel_within_slack_still_tracks(self):
        """Same setup with the shift inside the slack: the guard must not
        reject healthy large-but-in-window motion."""
        img0 = self._blob(100.0, 80.0)
        img1 = self._blob(112.0, 80.0)  # 12 px < 21 px slack
        pts = jnp.array([[100.0, 80.0]])
        _, flow, status = lk.pyramidal_lk(
            jnp.asarray(img0), jnp.asarray(img1), pts, jnp.ones(1, bool),
            num_levels=1,
        )
        assert bool(status[0])
        np.testing.assert_allclose(np.asarray(flow)[0], [12.0, 0.0], atol=0.3)

    def test_fast_motion_with_pyramid_recenters(self):
        """The pyramid guess recenters the target window per level, so the
        same >slack motion tracks fine with 3 levels (per-level residual
        travel stays small) — the guard only rejects per-level overruns."""
        img0 = self._blob(100.0, 80.0)
        img1 = self._blob(129.0, 80.0)
        pts = jnp.array([[100.0, 80.0]])
        _, flow, status = lk.pyramidal_lk(
            jnp.asarray(img0), jnp.asarray(img1), pts, jnp.ones(1, bool),
            num_levels=3,
        )
        assert bool(status[0])
        np.testing.assert_allclose(np.asarray(flow)[0], [29.0, 0.0], atol=0.5)


class TestGradients:
    def test_sobel_on_ramp(self):
        ramp = jnp.arange(32.0)[None, :].repeat(32, 0)  # I = x
        gx, gy = gradients.sobel(ramp, scale=1.0 / 8.0)
        # Sobel/8 of unit ramp = 1
        np.testing.assert_allclose(np.asarray(gx)[5:-5, 5:-5], 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gy)[5:-5, 5:-5], 0.0, atol=1e-5)

    def test_log_image(self):
        img = jnp.asarray([[0.0, 1.0]])
        out = gradients.log_image(img)
        np.testing.assert_allclose(
            np.asarray(out), [[np.log(0.1), np.log(1.1)]], rtol=1e-5
        )

    def test_pyramid_shapes(self):
        levels = gradients.image_pyramid(jnp.zeros((64, 48)), 3)
        assert [l.shape for l in levels] == [(64, 48), (32, 24), (16, 12)]


class TestPallasSplat:
    def test_matches_xla_splat(self, rng):
        """The hand-written Pallas kernel (interpret mode on CPU) matches
        the XLA matmul splat bit-for-bit-ish."""
        from evo_tpu.kernels.splat_pallas import splat_image_pallas

        n = 2000
        x = jnp.asarray(rng.uniform(0, 239, n), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 179, n), jnp.float32)
        w = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)
        a = splat_image_pallas(x, y, w, 180, 240, chunk=512, interpret=True)
        b = splat.splat_image(x, y, w, 180, 240)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
