"""Resolve the scan-timing discrepancy: queue-N vs dispatch+pull timing,
with a table that has ready patches (the skip branch lies otherwise)."""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


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
            sim.SimParams(duration_s=1.2, fps=20.0, seed=3, scene="3walls")
        )
        sim.write_dataset(out, s.generate())

    ds = Davis240cDataset(out)
    ev = Evaluator(ds, EvaluatorParams(output_dir="/tmp/evo_prof_out",
                                       run_compensation=False))
    ev.run(max_frames=8)
    ev.flush_pending()
    tr = ev.tracker

    it = FrameWindowIterator(ds)
    win = list(it)[10]
    t_us = win.events.t_us
    bounds = tr._subbatch_bounds(t_us)
    xyp, trel, offset, k = tr._window_batches(
        t_us, win.events.x, win.events.y, win.events.p, bounds)

    ex, ey, et, ep, mask = detector._unpack_jit(
        jnp.asarray(xyp), jnp.asarray(trel), jnp.asarray(offset))
    table, grads, pstate = tr.table, tr.grads, tr.pstate
    latest = grads[jnp.argmax(pstate.slot_birth)]
    jax.block_until_ready((ex, latest))

    scan_fn = jax.jit(align.process_window_scan)
    opt_fn = jax.jit(align.optimize_ready_patches)
    route_fn = jax.jit(ps.route_events)

    # a routed table with ready patches
    rt = table
    for i in range(min(2, k)):
        rt = route_fn(rt, ex[i], ey[i], et[i], ep[i], mask[i])
    ready = np.asarray(ps.is_ready(rt) & rt.alive & rt.initialized)
    print("ready patches after routing 2 sub-batches:", int(ready.sum()))

    def m_single(fn, n=6):
        # dispatch + full pull each iteration
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        t0 = time.perf_counter()
        for _ in range(n):
            np.asarray(jax.tree_util.tree_leaves(fn())[0])
        return (time.perf_counter() - t0) / n * 1e3

    def m_queue(fn, n=8):
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / n * 1e3

    scan = lambda: scan_fn(table, grads, ex, ey, et, ep, mask, latest)[0].center
    print(f"scan single: {m_single(scan):.1f} ms  queue8: {m_queue(scan):.1f} ms")

    opt = lambda: opt_fn(rt, grads)[0].center
    print(f"optimize(ready) single: {m_single(opt):.1f} ms  queue8: {m_queue(opt):.1f} ms")

    route = lambda: route_fn(table, ex[0], ey[0], et[0], ep[0], mask[0]).ev_count
    print(f"route single: {m_single(route):.1f} ms  queue8: {m_queue(route):.1f} ms")


if __name__ == "__main__":
    main()

# appended: frame-analyze + LK + fused-step measurements (reuses main's style)
