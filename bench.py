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


def bench_pipeline() -> dict:
    """Warm full-pipeline run: returns stream/wall seconds, events/s,
    real-time multiple, and per-stage host timings. Also records the
    temporal-batch A/B (VERDICT r3 item 7): the sequence-parallel
    compensation path (EvaluatorParams.temporal_batch — W windows solved in
    one dispatch, dist.temporal) measured against the default per-window
    cadence on this single chip, so the default is a recorded decision
    rather than a dead code path."""
    from evo_tpu.io.davis import Davis240cDataset
    from evo_tpu.run.evaluator import Evaluator, EvaluatorParams

    path = _sim_dataset_dir()

    def run_once(**kw):
        ds = Davis240cDataset(path)
        ev = Evaluator(ds, EvaluatorParams(output_dir="/tmp/evo_bench_out", **kw))
        t0 = time.perf_counter()
        ev.run()
        ev.flush_pending()
        wall = time.perf_counter() - t0
        return ev, wall

    os.makedirs("/tmp/evo_bench_out", exist_ok=True)
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
    s = ev.counters.summary()
    n_events = s.get("events", 0)
    n_frames = s.get("frames", 0)
    # stream duration: events arrive between first and last frame window
    stream_s = n_frames / 20.0
    return {
        "stream_s": round(stream_s, 3),
        "wall_s": round(wall, 3),
        "rt_multiple": round(stream_s / wall, 3) if wall > 0 else 0.0,
        "events_per_s": round(n_events / wall, 1) if wall > 0 else 0.0,
        "n_events": int(n_events),
        "n_frames": int(n_frames),
        "n_solves": int(s.get("solves", 0)),
        "stage_s": {
            k[5:-2]: s[k] for k in s if k.startswith("time_")
        },
        "temporal_batch_ab": {
            "batch": 4,
            "wall_s": round(tb_wall, 3),
            "rt_multiple": round(stream_s / tb_wall, 3) if tb_wall > 0 else 0.0,
            "note": "P3 sequence-parallel compensation on ONE chip; the "
                    "window axis pays off on a multi-chip batch mesh "
                    "(dist.temporal parity in tests/test_dist.py), default "
                    "follows whichever wall is lower here",
        },
    }


def main() -> None:
    _enable_cache()
    decode = bench_decode()
    variants = bench_decode_variants()
    pipe = bench_pipeline()
    print(
        json.dumps(
            {
                "metric": "event_decode_throughput",
                "value": decode["batch_4m"],
                "unit": "Mevents/s/chip",
                "vs_baseline": decode["batch_4m"],
                "decode_by_batch": decode,
                "pipeline": pipe,
                "decode_variants": variants,
            }
        )
    )


if __name__ == "__main__":
    main()
