"""Profile the fused window step's components on the real TPU.

Timing methodology for a remote-attached (tunneled) TPU: a device->host
pull costs a fixed ~20-66 ms round trip, so per-op wall timing is
meaningless. Instead, queue N dependent executions and end with ONE tiny
pull; wall = N x device_time + RTT, and RTT is measured separately by
pulling an already-landed scalar. Run: python tools/profile_scan.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 16


def qtime(dispatch, rtt_s, n=N):
    """dispatch() -> a device tree (async). Queue n executions, then one
    tiny pull; returns per-execution device ms after subtracting RTT."""
    out = dispatch()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # warm+land
    t0 = time.perf_counter()
    for _ in range(n):
        out = dispatch()
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]
    wall = time.perf_counter() - t0
    return (wall - rtt_s) / n * 1e3


def main():
    cache = "/root/repo/.jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from evo_tpu.io import sim
    from evo_tpu.io.davis import Davis240cDataset
    from evo_tpu.io.replay import FrameWindowIterator
    from evo_tpu.run.evaluator import Evaluator, EvaluatorParams
    from evo_tpu.tracker import align, detector, policy
    from evo_tpu.kernels import lk
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
    print("live patches:", tr.num_live)

    it = FrameWindowIterator(ds)
    wins = list(it)
    win = wins[10]
    t_us = win.events.t_us
    bounds = tr._subbatch_bounds(t_us)
    xyp, trel, offset, k = tr._window_batches(
        t_us, win.events.x, win.events.y, win.events.p, bounds)
    print(f"window: {len(t_us)} events, K={k} sub-batches")

    ex, ey, et, ep, mask = detector._unpack_jit(
        jnp.asarray(xyp), jnp.asarray(trel), jnp.asarray(offset))
    jax.block_until_ready((ex, ey))

    table, grads, pstate = tr.table, tr.grads, tr.pstate
    img = detector._as_f32_jit(jnp.asarray(np.asarray(win.image)))
    latest = grads[jnp.argmax(pstate.slot_birth)]
    scalar = jnp.float32(1.0) + 1.0
    np.asarray(scalar)

    # measure RTT: pull an already-landed scalar
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(scalar)
    rtt = (time.perf_counter() - t0) / 10
    print(f"pull RTT (landed scalar):   {rtt*1e3:.1f} ms")

    scan_fn = jax.jit(align.process_window_scan)
    opt_fn = jax.jit(align.optimize_ready_patches)
    route_fn = jax.jit(ps.route_events)
    integ_fn = jax.jit(align.integrate_events)
    bud_fn = jax.jit(align.update_num_of_events)

    ms = qtime(lambda: scan_fn(table, grads, ex, ey, et, ep, mask,
                               latest)[0].center, rtt)
    print(f"process_window_scan (K={k}): {ms:.2f} ms")

    ms_opt = qtime(lambda: opt_fn(table, grads)[0].center, rtt)
    print(f"optimize_ready_patches x1:  {ms_opt:.2f} ms (xK = {ms_opt*k:.2f})")

    ms = qtime(lambda: route_fn(table, ex[0], ey[0], et[0], ep[0],
                                mask[0]).ev_count, rtt)
    print(f"route_events x1:            {ms:.2f} ms")

    ms = qtime(lambda: integ_fn(table), rtt)
    print(f"integrate_events:           {ms:.2f} ms")

    ms = qtime(lambda: bud_fn(table, latest).num_of_events, rtt)
    print(f"update_num_of_events:       {ms:.2f} ms")

    p = tr.params
    fa = jax.jit(lambda im: detector._frame_analyze(
        im, max_corners=p.max_patches, quality_level=p.quality_level,
        min_distance=p.min_distance, block_size=p.block_size,
        border=ps.PATCH_EXTENT + 1))
    ms = qtime(lambda: fa(img)[0], rtt)
    print(f"_frame_analyze:             {ms:.2f} ms")

    pol_fn = jax.jit(lambda t, s, cx, cv: policy.frame_policy(
        t, s, cx, cv, max_patches=p.max_patches,
        association_distance=p.association_distance))
    cx, cv, _ = fa(img)
    jax.block_until_ready((cx, cv))
    ms = qtime(lambda: pol_fn(table, pstate, cx, cv)[0]["evict"], rtt)
    print(f"frame_policy:               {ms:.2f} ms")

    lk_fn = jax.jit(lambda a, b, c, m: lk.pyramidal_lk(
        a, b, c, m, num_levels=p.lk_levels, radius=p.lk_radius))
    msk = tr.table.alive & ~tr.table.initialized
    ms = qtime(lambda: lk_fn(img, img, table.center, msk)[1], rtt)
    print(f"pyramidal_lk:               {ms:.2f} ms")

    # full fused step: dispatch-only rate (the production hot loop never
    # pulls per window; consume is batched)
    def full_step():
        _, h = tr.process_frame_window(
            t_us, win.events.x, win.events.y, win.events.p,
            int(win.image_t_us), np.asarray(win.image))
        return h[1]["framelog"]["alive"]
    ms = qtime(full_step, rtt)
    print(f"fused step (dispatch+exec): {ms:.2f} ms")


if __name__ == "__main__":
    main()
