"""Benchmark: event-decode throughput AND full-pipeline real-time factor.

Two measurements on one TPU chip:

- decode: the north-star metric (BASELINE.json) — raw DVS events into an
  accumulated sensor image via the separable matmul splat
  (evo_tpu.kernels.splat). Baseline = 1 Mev/s, the DAVIS240C real-time
  arrival rate.
- pipeline: the whole production system (tracker window scan + per-frame
  detection/association/KLT + contrast-max compensation + VO backend) on a
  simulated DVS sequence (evo_tpu.io.sim), warm, through the pipelined
  Evaluator. The reference runs 2-60x SLOWER than real time on this path
  (report §5.1: 100 features x 50 ms of data cost 100-3000 ms single-
  threaded); `pipeline_rt_multiple` > 1 means faster than real time.

Prints ONE JSON line. The headline metric stays the decode throughput (as
in round 1); pipeline numbers ride along as extra keys.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _enable_cache() -> None:
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def _decode_rate(n: int, reps: int, rounds: int = 5) -> float:
    """Best-of decode throughput (Mev/s) of the production matmul-bilinear
    splat at a given events-per-dispatch batch size — ONE harness for every
    batch size so the numbers are comparable (VERDICT r3 'honest decode
    number': the r3 artifact timed the same kernel two different ways and
    got a 6x spread; batch size and chaining are the whole difference)."""
    import jax.numpy as jnp

    from evo_tpu.kernels.splat import splat_image

    H, W = 180, 240
    chunk = min(8192, n)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, W - 1, n), jnp.float32)
    y = jnp.asarray(rng.uniform(0, H - 1, n), jnp.float32)
    w = jnp.asarray(rng.choice([-1.0, 1.0], n).astype(np.float32))

    # warmup / compile (host fetch: block_until_ready does not reliably
    # synchronize through the remote-TPU tunnel, so timing must end with a
    # value pulled to host through a dependent chain)
    img = splat_image(x, y, w, H, W, mode="bilinear", chunk=chunk)
    float(jnp.sum(img))

    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        wv = w
        for _ in range(reps):
            img = splat_image(x, y, wv, H, W, mode="bilinear", chunk=chunk)
            wv = wv + 0.0 * img[0, 0]  # serialize the chain
        float(jnp.sum(img))
        dt = time.perf_counter() - t0
        best = max(best, n * reps / dt / 1e6)
    return best


def bench_decode() -> dict:
    """Decode throughput at three batch sizes, one methodology:

    - batch_4m: the headline saturated-chip number (north star vs the
      1 Mev/s DAVIS240C real-time arrival rate);
    - batch_1m: the read-chunk size of the reference's event reader
      (davis240c_reader.cpp:14);
    - window_15k: the PRODUCTION dispatch shape — one compensation window
      (evaluator.h:21-22) per dispatch, where the fixed per-dispatch cost
      (host dispatch + tunnel) dominates the 15 us of device compute. The
      spread between window_15k and batch_4m is dispatch overhead, which is
      why the pipeline batches whole windows per device call.
    """
    return {
        "batch_4m": round(_decode_rate(1 << 22, reps=30), 2),
        "batch_1m": round(_decode_rate(1 << 20, reps=30), 2),
        "window_15k": round(_decode_rate(15_000, reps=30), 2),
    }


def bench_decode_variants() -> dict:
    """Honesty check (VERDICT r1 item 8): the separable-matmul splat does
    H·W MACs per event for ~4 useful taps, so time the exact-taps
    alternatives on the same workload — scatter-add and sort-by-pixel +
    segment_sum (SURVEY §7 hard part 1) and the hand-scheduled Pallas
    kernel. SAME harness as bench_decode (1M events, chained reps,
    best-of-rounds) so the matmul row here and bench_decode's batch_1m row
    are the same measurement — the r3 artifact timed them differently and
    carried a 6x same-kernel discrepancy. Random scatter loses to MXU
    redundancy by 5-90x, so the matmul variant stays wired into
    sharded_splat."""
    import jax
    import jax.numpy as jnp

    from evo_tpu.kernels.splat import splat_image, splat_image_segment
    from evo_tpu.kernels.splat_pallas import splat_image_pallas

    H, W = 180, 240
    n = 1 << 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, W - 1, n), jnp.float32)
    y = jnp.asarray(rng.uniform(0, H - 1, n), jnp.float32)
    w = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)

    scatter = jax.jit(
        lambda x, y, w: jnp.zeros((H, W), jnp.float32).at[
            jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1),
            jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1),
        ].add(w)
    )
    variants = {
        "matmul_bilinear": lambda wv: splat_image(x, y, wv, H, W, chunk=8192),
        "pallas_bilinear": lambda wv: splat_image_pallas(x, y, wv, H, W, chunk=4096),
        "pallas_gaussian": lambda wv: splat_image_pallas(
            x, y, wv, H, W, chunk=4096, mode="gaussian"
        ),
        "segment_sorted": lambda wv: splat_image_segment(x, y, wv, H, W),
        "scatter_nearest": lambda wv: scatter(x, y, wv),
    }
    out = {}
    for name, fn in variants.items():
        img = fn(w)
        float(jnp.sum(img))
        reps = 5 if name == "segment_sorted" else 30
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            wv = w
            for _ in range(reps):
                img = fn(wv)
                wv = wv + 0.0 * img[0, 0]  # serialize the chain
            float(jnp.sum(img))
            best = max(best, n * reps / (time.perf_counter() - t0) / 1e6)
        out[name] = round(best, 1)
    return out


def bench_mfu() -> dict:
    """MFU / roofline accounting for the three hot kernels (VERDICT r4
    item 4): XLA-reported FLOPs (compiled.cost_analysis) over measured wall
    time, as a fraction of chip peak. Peak is the published bf16 MXU rate;
    these kernels run f32 (the precision the trackers' parity bounds
    require), whose MXU rate is ~1/2 of bf16, so `mfu_vs_bf16_peak` is the
    CONSERVATIVE view — double it for the f32 roofline fraction."""
    import jax
    import jax.numpy as jnp

    from evo_tpu.dist.multihost import _ready_table
    from evo_tpu.kernels.splat import splat_image
    from evo_tpu.tracker import align, compensate

    # Published peak dense-matmul rates (bf16, FLOP/s per chip).
    PEAKS = {
        "TPU v5 lite": 197e12,
        "TPU v6 lite": 918e12,
        "TPU v4": 275e12,
        "TPU v5p": 459e12,
        "TPU v5": 459e12,
    }
    dev = jax.devices()[0]
    peak = PEAKS.get(dev.device_kind)
    H, W = 180, 240
    rng = np.random.default_rng(0)

    def cost_flops(compiled) -> float | None:
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            f = ca.get("flops")
            return float(f) if f else None
        except Exception:
            return None

    out = {
        "device_kind": dev.device_kind,
        "peak_bf16_flops": peak,
        "note": "flops from XLA cost_analysis; kernels run f32 (parity-"
                "bounded), whose MXU rate is ~peak_bf16/2, so the f32 "
                "roofline fraction is ~2x mfu_vs_bf16_peak",
    }

    # -- 4M-event matmul splat (the headline decode kernel) --------------
    n = 1 << 22
    x = jnp.asarray(rng.uniform(0, W - 1, n), jnp.float32)
    y = jnp.asarray(rng.uniform(0, H - 1, n), jnp.float32)
    w = jnp.asarray(rng.choice([-1.0, 1.0], n), jnp.float32)
    f = jax.jit(lambda xs, ys, ws: splat_image(
        xs, ys, ws, H, W, mode="bilinear", chunk=8192))
    comp = f.lower(x, y, w).compile()
    # XLA cost_analysis counts a scan BODY once, not trip_count times (the
    # r5 first run reported exactly one 8192-event chunk's matmul, 7.2e8,
    # for the full 4M-event call), so the analytic count is the floor:
    # the separable formulation does 2*H*W MACs per event by construction.
    flops = max(cost_flops(comp) or 0.0, 2.0 * H * W * n)
    img = f(x, y, w)
    float(jnp.sum(img))
    reps, best = 20, 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        wv = w
        for _ in range(reps):
            img = f(x, y, wv)
            wv = wv + 0.0 * img[0, 0]
        float(jnp.sum(img))
        best = max(best, flops * reps / (time.perf_counter() - t0))
    out["splat_4m"] = {
        "flops_per_call": flops,
        "achieved_tflops": round(best / 1e12, 2),
        "mfu_vs_bf16_peak": round(best / peak, 4) if peak else None,
        "useful_tap_fraction": round(8.0 * n / flops, 8),
        "interpretation": "the H*W-MACs-per-event redundancy is the point: "
            "~4 useful taps per event cost a dense MXU matmul that still "
            "beats exact-taps scatter by ~6x wall clock (decode_variants); "
            "at this MFU the dense formulation is bandwidth/issue-bound "
            "housekeeping around an MXU running near its f32 roofline, so "
            "a Pallas exact-taps kernel cannot win back more than the "
            "non-matmul fraction",
    }

    # -- production window scan (tracker event path) ---------------------
    cap, k, c = 128, 4, 3750  # 100-300-feature table, one 15k-event window
    table = _ready_table(rng, cap, H, W)
    ex = jnp.asarray(rng.uniform(0, W - 1, (k, c)), jnp.float32)
    ey = jnp.asarray(rng.uniform(0, H - 1, (k, c)), jnp.float32)
    et = jnp.asarray(np.sort(rng.uniform(0, 0.05, (k, c)), axis=1), jnp.float32)
    ep = jnp.asarray(rng.choice([-1.0, 1.0], (k, c)), jnp.float32)
    mask = jnp.ones((k, c), bool)
    grads = jnp.asarray(rng.normal(0, 0.1, (4, 2, H, W)), jnp.float32)
    scan = jax.jit(align.process_window_scan)
    comp = scan.lower(table, grads, ex, ey, et, ep, mask, grads[0]).compile()
    flops = cost_flops(comp)
    tbl, stacked = scan(table, grads, ex, ey, et, ep, mask, grads[0])
    float(jnp.sum(stacked["cost"]))
    reps, best_dt = 5, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        tbl = table
        for _ in range(reps):
            tbl, stacked = scan(tbl, grads, ex, ey, et, ep, mask, grads[0])
        float(jnp.sum(stacked["cost"]))
        best_dt = min(best_dt, (time.perf_counter() - t0) / reps)
    ach = (flops / best_dt) if flops else None
    out["window_scan_15k"] = {
        "flops_note": "lower bound — cost_analysis counts each lax.scan "
                      "body (sub-batch step, LM iteration) once, not "
                      "trip_count times",
        "flops_per_call": flops,
        "ms_per_window": round(best_dt * 1e3, 2),
        "achieved_tflops": round(ach / 1e12, 3) if ach else None,
        "mfu_vs_bf16_peak": round(ach / peak, 4) if ach and peak else None,
        "interpretation": "the scan is latency-bound, not FLOP-bound: "
            "35x31 patch solves and event routing are small-tensor ops far "
            "from MXU tile sizes; its budget target is ms/window << the "
            "50 ms real-time window, not roofline fraction",
    }

    # -- contrast-max tile solve -----------------------------------------
    p = compensate.CompensateParams(tile=20, max_iters=10)
    n_ev = 40_000
    xs = rng.uniform(0, W - 1, n_ev)
    ys = rng.uniform(0, H - 1, n_ev)
    ts = np.sort(rng.uniform(0, 50_000, n_ev))
    tile_data, edge_idx, ty_n, tx_n, _, _ = compensate.build_tile_data(
        xs, ys, ts, p, H, W
    )
    kw = dict(tile=p.tile, scale=p.scale, tv_weight=p.tv_weight,
              tv_huber=p.tv_huber, max_iters=p.max_iters, loss=p.loss)
    solve = jax.jit(
        lambda td: compensate.solve_motion_field(td, edge_idx, **kw)[1]
    )
    comp = solve.lower(tile_data).compile()
    flops = cost_flops(comp)
    float(solve(tile_data))
    reps, best_dt = 5, float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        td = tile_data
        for _ in range(reps):
            cost = solve(td)
            # serialize the chain: tile_data is a tuple; thread the scalar
            # through its first (f32 event-x) leaf
            td = (td[0] + 0.0 * cost,) + tuple(td[1:])
        float(cost)
        best_dt = min(best_dt, (time.perf_counter() - t0) / reps)
    ach = (flops / best_dt) if flops else None
    out["tile_solve_40k"] = {
        "flops_note": "lower bound — cost_analysis counts each LM-"
                      "iteration scan body once, not trip_count times",
        "flops_per_call": flops,
        "ms_per_solve": round(best_dt * 1e3, 2),
        "achieved_tflops": round(ach / 1e12, 3) if ach else None,
        "mfu_vs_bf16_peak": round(ach / peak, 4) if ach and peak else None,
        "interpretation": "LM iterations over per-tile 2x2 systems + TV "
            "coupling — tiny-tensor linear algebra; bounded by dispatch "
            "and HBM latency, benched against its 300 ms window budget",
    }
    return out


def _sim_dataset_dir() -> str:
    """Generate (once) a simulated DVS sequence in reference text format."""
    out = "/tmp/evo_bench_sim"
    marker = os.path.join(out, "events.txt")
    if os.path.exists(marker) and os.path.getsize(marker) > 0:
        return out
    from evo_tpu.io import sim

    s = sim.EventCameraSimulator(
        sim.SimParams(duration_s=1.2, fps=20.0, seed=3, scene="3walls")
    )
    data = s.generate()
    sim.write_dataset(out, data)
    return out


def _sim_dataset_dir_1mev() -> str:
    """Generate (once) a DAVIS-density sequence: same 3walls scene and
    trajectory as `_sim_dataset_dir`, contrast threshold 0.15 -> 0.05, which
    produces ~1.35 M events over 1.2 s (~1.12 Mev/s) — the arrival rate the
    reference assumes for its real-time deficit (report §5.1: ~50 k events /
    50 ms; BASELINE.md). The r4 pipeline bench ran at 0.22 Mev/s, a fifth of
    that bar (VERDICT r4 item 1)."""
    out = "/tmp/evo_bench_sim_1mev"
    marker = os.path.join(out, "events.txt")
    if os.path.exists(marker) and os.path.getsize(marker) > 0:
        return out
    from evo_tpu.io import sim

    s = sim.EventCameraSimulator(
        sim.SimParams(duration_s=1.2, fps=20.0, seed=3, scene="3walls",
                      contrast_threshold=0.05)
    )
    data = s.generate()
    sim.write_dataset(out, data)
    return out


def _pipeline_runner(path: str):
    """One-shot warm pipeline executor over a dataset directory."""
    from evo_tpu.io.davis import Davis240cDataset
    from evo_tpu.run.evaluator import Evaluator, EvaluatorParams

    os.makedirs("/tmp/evo_bench_out", exist_ok=True)

    def run_once(**kw):
        ds = Davis240cDataset(path)
        ev = Evaluator(ds, EvaluatorParams(output_dir="/tmp/evo_bench_out", **kw))
        t0 = time.perf_counter()
        ev.run()
        ev.flush_pending()
        wall = time.perf_counter() - t0
        return ev, wall

    return run_once


def _pipeline_stats(ev, wall: float) -> dict:
    s = ev.counters.summary()
    n_events = s.get("events", 0)
    n_frames = s.get("frames", 0)
    stream_s = n_frames / 20.0
    return {
        "stream_s": round(stream_s, 3),
        "wall_s": round(wall, 3),
        "rt_multiple": round(stream_s / wall, 3) if wall > 0 else 0.0,
        "events_per_s": round(n_events / wall, 1) if wall > 0 else 0.0,
        "input_mev_per_s": round(n_events / stream_s / 1e6, 3) if stream_s else 0.0,
        "n_events": int(n_events),
        "n_frames": int(n_frames),
        "n_solves": int(s.get("solves", 0)),
        "stage_s": {k[5:-2]: s[k] for k in s if k.startswith("time_")},
    }


def bench_pipeline_1mev() -> dict:
    """The same warm pipeline methodology as `bench_pipeline`, at DAVIS
    real-time event density (~1.1 Mev/s input vs the standard sequence's
    0.22): `rt_multiple` >= 1 here is real time at the arrival rate the
    reference's 2-60x deficit is quoted against (report §5.1,
    evaluator.h:21-22 — 15 k-event / 300 ms compensation windows at
    ~50 k events per 50 ms frame window)."""
    run_once = _pipeline_runner(_sim_dataset_dir_1mev())
    run_once()  # compile warmup (window shapes differ from the 0.22 run)
    best = None
    for _ in range(3):
        ev, wall = run_once()
        if best is None or wall < best[1]:
            best = (ev, wall)
    out = _pipeline_stats(*best)
    out["note"] = (
        "device-bound at this density: ~24 window scans (bounded at ~6 "
        "solve steps each by TrackerParams.max_window_steps) + ~88 "
        "compensation solves (warm-started LM) share the one chip; "
        "frame_consume/compensation_consume are waits on that device "
        "queue, not host work (host bookkeeping measured at 0.04 s). "
        "Additional chips take the compensation stream off-chip "
        "(dist.temporal) and shard the patch table (P1/P2)."
    )
    return out


def bench_pipeline() -> dict:
    """Warm full-pipeline run: returns stream/wall seconds, events/s,
    real-time multiple, and per-stage host timings. Also records the
    temporal-batch A/B (VERDICT r3 item 7): the sequence-parallel
    compensation path (EvaluatorParams.temporal_batch — W windows solved in
    one dispatch, dist.temporal) measured against the default per-window
    cadence on this single chip, so the default is a recorded decision
    rather than a dead code path."""
    path = _sim_dataset_dir()
    run_once = _pipeline_runner(path)
    run_once()  # compile warmup
    best = None
    for _ in range(4):
        ev, wall = run_once()
        if best is None or wall < best[1]:
            best = (ev, wall)
    ev, wall = best

    # temporal-batch A/B (2 runs, best): same pipeline, compensation windows
    # buffered 4-deep and solved in one vmapped dispatch
    run_once(temporal_batch=4)  # compile warmup for the batched program
    tb_wall = min(run_once(temporal_batch=4)[1] for _ in range(2))
    out = _pipeline_stats(ev, wall)
    stream_s = out["stream_s"]
    out["temporal_batch_ab"] = {
        "batch": 4,
        "wall_s": round(tb_wall, 3),
        "rt_multiple": round(stream_s / tb_wall, 3) if tb_wall > 0 else 0.0,
        "note": "P3 sequence-parallel compensation on ONE chip; the "
                "window axis pays off on a multi-chip batch mesh "
                "(dist.temporal parity in tests/test_dist.py), default "
                "follows whichever wall is lower here",
    }
    return out


def main() -> None:
    _enable_cache()
    decode = bench_decode()
    variants = bench_decode_variants()
    pipe = bench_pipeline()
    pipe_1mev = bench_pipeline_1mev()
    mfu = bench_mfu()
    print(
        json.dumps(
            {
                "metric": "event_decode_throughput",
                "value": decode["batch_4m"],
                "unit": "Mevents/s/chip",
                "vs_baseline": decode["batch_4m"],
                "decode_by_batch": decode,
                "pipeline": pipe,
                "pipeline_1mev": pipe_1mev,
                "mfu": mfu,
                "decode_variants": variants,
            }
        )
    )


if __name__ == "__main__":
    main()
