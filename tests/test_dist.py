"""Distribution tests on the 8-device virtual CPU mesh: sharded decode
parity, halo exchange, psum-reduced BA normal equations — the 1-device vs
N-device agreement tests SURVEY.md §4 calls for."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from evo_tpu.dist import halo, mesh, reduce, tiling
from evo_tpu.kernels.splat import splat_image
from tests.test_run import square_dataset  # noqa: F401 (fixture)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return mesh.make_mesh(n_space=1, n_batch=8)


@pytest.fixture(scope="module")
def mesh_space4():
    return mesh.make_mesh(n_space=4, n_batch=2)


class TestShardedSplat:
    def test_matches_single_device(self, mesh8, rng):
        n = 8 * 1024
        x = jnp.asarray(rng.uniform(0, 239, n), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 179, n), jnp.float32)
        w = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)
        ref = splat_image(x, y, w, 180, 240, chunk=1024)
        out = tiling.sharded_splat(mesh8, x, y, w, 180, 240, chunk=1024)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


class TestHalo:
    def test_exchange_halo_strips(self, mesh_space4):
        # field [4, 8] sharded into 4 column blocks of 2
        field = jnp.arange(32, dtype=jnp.float32).reshape(4, 8)

        @partial(
            jax.shard_map, mesh=mesh_space4,
            in_specs=P(None, mesh.SPACE_AXIS),
            out_specs=(P(None, mesh.SPACE_AXIS), P(None, mesh.SPACE_AXIS)),
        )
        def run(local):
            return halo.exchange_halo(local, width=1, axis=1)

        from_left, from_right = run(field)
        fl = np.asarray(from_left)
        fr = np.asarray(from_right)
        # device owning cols [2,3] receives col 1 from the left and col 4
        # from the right
        np.testing.assert_allclose(fl[:, 1], np.asarray(field)[:, 1])
        np.testing.assert_allclose(fr[:, 1], np.asarray(field)[:, 4])
        # left edge device receives zeros from the (nonexistent) left
        np.testing.assert_allclose(fl[:, 0], 0.0)
        np.testing.assert_allclose(fr[:, 3], 0.0)

    def test_halo_reduction_matches_unsharded_splat(self, mesh_space4, rng):
        """Gaussian splat with the image sharded into column blocks: events
        are splatted into halo-padded local blocks, margins are ppermute'd
        to neighbors, and the stitched result must match the unsharded
        splat (radius-3 stamps crossing shard boundaries included)."""
        H, W = 32, 64
        n_dev = 4
        wloc = W // n_dev
        halo_w = 3
        n = 512
        x = rng.uniform(3, W - 3, n).astype(np.float32)
        y = rng.uniform(3, H - 3, n).astype(np.float32)
        w = rng.choice([-1.0, 1.0], n).astype(np.float32)
        ref = splat_image(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), H, W,
            mode="gaussian", chunk=128,
        )

        # each device gets ALL events (broadcast) but only splats those
        # belonging to its padded block; exactness comes from halo folding
        owner = np.clip((x // wloc).astype(np.int32), 0, n_dev - 1)

        @partial(
            jax.shard_map, mesh=mesh_space4,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(None, mesh.SPACE_AXIS),
        )
        def run(xs, ys, ws, own):
            dev = jax.lax.axis_index(mesh.SPACE_AXIS)
            mine = (own == dev).astype(ws.dtype)
            x_loc = xs - dev * wloc + halo_w  # local padded coords
            local = splat_image(
                x_loc, ys, ws * mine, H, wloc + 2 * halo_w,
                mode="gaussian", chunk=128,
            )
            return halo.splat_with_halo_reduction(
                local, axis_name=mesh.SPACE_AXIS, halo_width=halo_w, axis=1
            )

        out = run(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), jnp.asarray(owner))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


class TestShardedTileSolve:
    def test_matches_single_device(self, mesh_space4, rng):
        """Space-sharded contrast-max solve (tile columns over 4 devices,
        TV halo coupling at shard boundaries) == the 1-device
        solve_motion_field on the same window."""
        from evo_tpu.tracker import compensate as comp

        H, W, tile = 60, 80, 20  # 3x4 tile grid, txl=1 per device
        p = comp.CompensateParams(
            tile=tile, min_events=10, max_iters=6, events_per_tile_cap=512
        )
        # moving edge pattern: events drift with a common velocity so the
        # contrast objective has signal in every tile
        n = 4000
        t = np.sort(rng.uniform(0, 30_000, n)).astype(np.int64)  # 30 ms
        base_x = rng.uniform(2, W - 3, n)
        base_y = rng.uniform(2, H - 3, n)
        # quantize to lines to create structure
        base_x = np.round(base_x / 6) * 6 + rng.normal(0, 0.2, n)
        vx, vy = 0.08, -0.05  # px/ms
        x = np.clip(base_x + vx * (t * 1e-3), 0, W - 1)
        y = np.clip(base_y + vy * (t * 1e-3), 0, H - 1)

        v_ref, img_ref, c_ref, c0_ref = comp.compensate_window(
            x, y, t, p, height=H, width=W
        )
        v_sh, img_sh, c_sh, c0_sh = comp.compensate_window(
            x, y, t, p, height=H, width=W, mesh=mesh_space4
        )
        assert np.isfinite(c_sh) and c_sh <= c0_sh + 1e-3
        np.testing.assert_allclose(c0_sh, c0_ref, rtol=1e-5)
        np.testing.assert_allclose(v_sh, v_ref, atol=5e-3)
        np.testing.assert_allclose(img_sh, img_ref, atol=1e-3)


class TestShardedBA:
    def test_normal_equations_match_psum(self, mesh8, rng):
        import tests.test_vo as tv

        intr, poses, pts, (of, ol, op) = tv._synthetic_ba_problem(rng)
        O = len(of)
        Ob = ((O + 7) // 8) * 8  # pad to multiple of 8 for sharding
        pad = Ob - O
        of = np.concatenate([of, np.zeros(pad, np.int32)])
        ol = np.concatenate([ol, np.zeros(pad, np.int32)])
        op = np.concatenate([op, np.zeros((pad, 2), np.float32)])
        om = np.concatenate([np.ones(O, bool), np.zeros(pad, bool)])
        fixed = np.zeros(poses.shape[0], bool)
        fixed[:2] = True

        Hpp, Hll, A, bp, bl = reduce.sharded_normal_equations(
            mesh8, poses, pts, intr,
            jnp.asarray(of), jnp.asarray(ol), jnp.asarray(op),
            jnp.asarray(om), jnp.asarray(fixed),
        )
        # reference single-device assembly (same math, no mesh)
        mesh1 = mesh.make_mesh(n_space=1, n_batch=1, devices=jax.devices()[:1])
        rHpp, rHll, rA, rbp, rbl = reduce.sharded_normal_equations(
            mesh1, poses, pts, intr,
            jnp.asarray(of), jnp.asarray(ol), jnp.asarray(op),
            jnp.asarray(om), jnp.asarray(fixed),
        )
        np.testing.assert_allclose(np.asarray(Hpp), np.asarray(rHpp), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(Hll), np.asarray(rHll), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(bp), np.asarray(rbp), rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(bl), np.asarray(rbl), rtol=1e-4, atol=1e-2)


class TestScaling:
    def test_sharded_decode_efficiency(self):
        """Collective/shard overhead of the sharded decode on the CPU mesh:
        sharding the same total work over 2 devices must not cost more than
        20% vs the single-device run at equal physical resources (the
        comm_efficiency view — raw weak scaling on a virtual mesh is bounded
        by physical-core time-sharing, see multihost.measure_scaling)."""
        from evo_tpu.dist.multihost import measure_scaling

        res = measure_scaling(events_per_device=1 << 15, repeats=2)
        assert set(res) >= {1, 2}
        assert res[2]["comm_efficiency"] >= 0.8, res


class TestDistributedPipeline:
    def test_full_pipeline_matches_single_device(self, square_dataset, tmp_path):
        """The production Evaluator pipeline (tracker window scan + contrast
        compensation + VO) on a 4x2 mesh — patch table sharded over all 8
        devices, tile columns space-sharded with TV halo coupling — produces
        the same trajectory/vo artifacts as the unsharded run."""
        from evo_tpu.io import davis
        from evo_tpu.run.evaluator import Evaluator, EvaluatorParams
        from evo_tpu.tracker.compensate import CompensateParams

        def run(out, m):
            ds = davis.Davis240cDataset(square_dataset)
            params = EvaluatorParams(
                output_dir=str(out), mesh=m,
                compensation_events=4000,
                compensate=CompensateParams(max_iters=6, events_per_tile_cap=512),
            )
            ev = Evaluator(ds, params)
            ev.run(max_frames=5)
            paths = ev.finish()
            return ev, paths

        ref_dir = tmp_path / "ref"
        sh_dir = tmp_path / "sh"
        ref_dir.mkdir()
        sh_dir.mkdir()
        ev1, p1 = run(ref_dir, None)
        m = mesh.make_mesh(n_space=4, n_batch=2)
        ev2, p2 = run(sh_dir, m)

        t1 = davis.parse_trajectory(p1["trajectory"])
        t2 = davis.parse_trajectory(p2["trajectory"])
        assert set(t1) == set(t2)
        for tid in t1:
            ts1, xy1 = t1[tid]
            ts2, xy2 = t2[tid]
            np.testing.assert_array_equal(ts1, ts2)
            np.testing.assert_allclose(xy1, xy2, atol=0.1)
        np.testing.assert_allclose(
            ev2.motion_field, ev1.motion_field, atol=5e-3
        )
        if "vo_trajectory" in p1:
            v1 = np.loadtxt(p1["vo_trajectory"])
            v2 = np.loadtxt(p2["vo_trajectory"])
            np.testing.assert_allclose(v2, v1, atol=5e-2)


class TestShardedPatchSolve:
    def test_patch_table_shards_over_batch(self, mesh8):
        """The alignment solve runs shard-wise over the patch table with no
        cross-patch dependence: 8-way sharded result == single-device."""
        import tests.test_tracker as tt
        from evo_tpu.tracker import align
        from evo_tpu.tracker import patch_state as ps

        table = tt.empty_with_patches(
            centers=[(40.0 + 16 * i, 60.0) for i in range(8)]
        )
        table = tt.route_uniform(table, 120)
        grads = jnp.zeros((ps.GRAD_SLOTS, 2, 180, 240), jnp.float32)

        ref_table, ref_info = align.optimize_ready_patches(table, grads)

        def solve_fn(tbl, g):
            t2, info = align.optimize_ready_patches(tbl, g)
            return t2.center

        out = tiling.sharded_patch_solve(mesh8, solve_fn, table, grads)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_table.center), atol=1e-4
        )
