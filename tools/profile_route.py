"""Decompose route_events + scan costs on the real TPU; compare one-hot
contraction dtypes (bf16 vs int8) and locate the scan's per-step cost."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def qtime(dispatch, n=12):
    out = dispatch()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = dispatch()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from evo_tpu.io import sim
    from evo_tpu.io.davis import Davis240cDataset
    from evo_tpu.io.replay import FrameWindowIterator
    from evo_tpu.run.evaluator import Evaluator, EvaluatorParams
    from evo_tpu.tracker import align, detector
    from evo_tpu.tracker import patch_state as ps

    out = "/tmp/evo_bench_sim"
    if not os.path.exists(os.path.join(out, "events.txt")):
        s = sim.EventCameraSimulator(
            sim.SimParams(duration_s=1.2, fps=20.0, seed=3, scene="3walls"))
        sim.write_dataset(out, s.generate())
    ds = Davis240cDataset(out)
    ev = Evaluator(ds, EvaluatorParams(output_dir="/tmp/evo_prof_out",
                                       run_compensation=False))
    ev.run(max_frames=8)
    ev.flush_pending()
    tr = ev.tracker
    win = list(FrameWindowIterator(ds))[10]
    t_us = win.events.t_us
    bounds = tr._subbatch_bounds(t_us)
    xyp, trel, offset, k = tr._window_batches(
        t_us, win.events.x, win.events.y, win.events.p, bounds)
    ex, ey, et, ep, mask = detector._unpack_jit(
        jnp.asarray(xyp), jnp.asarray(trel), jnp.asarray(offset))
    table, grads = tr.table, tr.grads
    latest = grads[jnp.argmax(tr.pstate.slot_birth)]
    jax.block_until_ready((ex, latest))
    p, e = table.ev_t.shape
    n = ex.shape[1] if ex.ndim == 2 else ex.shape[0]
    ex0, ey0, et0, ep0, m0 = ex[0], ey[0], et[0], ep[0], mask[0]
    n = ex0.shape[0]
    print(f"P={p} E={e} N={n} K={k}")

    # --- route sub-pieces ---
    @jax.jit
    def hits_cumsum(tbl, x, y, m):
        inx = jnp.abs(x[None, :] - tbl.center[:, 0:1]) <= ps.PATCH_EXTENT
        iny = jnp.abs(y[None, :] - tbl.center[:, 1:2]) <= ps.PATCH_EXTENT
        hit = inx & iny & tbl.alive[:, None] & m[None, :]
        rank1 = jnp.cumsum(hit, axis=1, dtype=jnp.int32)
        return rank1

    print(f"hit+cumsum:        {qtime(lambda: hits_cumsum(table, ex0, ey0, m0)):.2f} ms")

    def mk_route(dtype, acc):
        @jax.jit
        def f(tbl, x, y, m):
            rank1 = hits_cumsum(tbl, x, y, m)
            hit = rank1 > jnp.concatenate([jnp.zeros((p, 1), jnp.int32),
                                           rank1[:, :-1]], axis=1)
            tot = rank1[:, -1:]
            keep = hit & (rank1 > tot - e)
            slot = (tbl.ev_count[:, None] + rank1 - 1) % e
            e_hi = e // 16
            hig = jax.lax.broadcasted_iota(jnp.int32, (1, 1, e_hi), 2)
            log = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 16), 2)
            oh_hi = ((slot[:, :, None] // 16 == hig) & keep[:, :, None]).astype(dtype)
            oh_lo_b = (slot[:, :, None] % 16 == log)
            val = jnp.arange(1, n + 1, dtype=jnp.int32)[None, :, None]
            ring = None
            for shift in range(0, max(1, int(n).bit_length()), 7):
                digit = ((val >> shift) & 127).astype(dtype)
                c = jnp.einsum("pnh,pnl->phl", oh_hi,
                               oh_lo_b.astype(dtype) * digit,
                               preferred_element_type=acc)
                c = c.astype(jnp.int32) if acc == jnp.int32 else c
                term = (1 << shift) * c
                ring = term if ring is None else ring + term
            return ring

        return f

    fb = mk_route(jnp.bfloat16, jnp.float32)
    print(f"route onehot+einsum bf16: {qtime(lambda: fb(table, ex0, ey0, m0)):.2f} ms")
    fi = mk_route(jnp.int8, jnp.int32)
    print(f"route onehot+einsum int8: {qtime(lambda: fi(table, ex0, ey0, m0)):.2f} ms")

    route_fn = jax.jit(ps.route_events)
    print(f"route full:        {qtime(lambda: route_fn(table, ex0, ey0, et0, ep0, m0).ev_count):.2f} ms")

    # --- scan with all-masked events: routing shapes identical, solves skip
    scan_fn = jax.jit(align.process_window_scan)
    none = jnp.zeros_like(mask)
    print(f"scan masked-out:   {qtime(lambda: scan_fn(table, grads, ex, ey, et, ep, none, latest)[0].center):.2f} ms")
    print(f"scan real:         {qtime(lambda: scan_fn(table, grads, ex, ey, et, ep, mask, latest)[0].center):.2f} ms")

    # --- optimize with varying ready counts ---
    import dataclasses
    opt_fn = jax.jit(align.optimize_ready_patches)
    rt = table
    route_j = jax.jit(ps.route_events)
    for i in range(min(2, k)):
        rt = route_j(rt, ex[i], ey[i], et[i], ep[i], mask[i])
    print(f"optimize all-ready: {qtime(lambda: opt_fn(rt, grads)[0].center):.2f} ms")
    nr = dataclasses.replace(rt, counter=jnp.zeros_like(rt.counter))
    print(f"optimize none-ready:{qtime(lambda: opt_fn(nr, grads)[0].center):.2f} ms")


if __name__ == "__main__":
    main()
