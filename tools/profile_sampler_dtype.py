"""Time the production window-scan dispatch on the real TPU under the
current EVO_SAMPLE_MXU_DTYPE — one half of the sampler-precision A/B
recorded in PRECISION.json ("sampler_mxu_dtype"). Run twice:

    python tools/profile_sampler_dtype.py                      # f32
    EVO_SAMPLE_MXU_DTYPE=bfloat16 python tools/profile_sampler_dtype.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from evo_tpu.io import sim
    from evo_tpu.io.davis import Davis240cDataset
    from evo_tpu.io.replay import FrameWindowIterator
    from evo_tpu.run.evaluator import Evaluator, EvaluatorParams
    from evo_tpu.tracker import align, detector

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

    def dispatch():
        tbl, stacked = align.process_window_scan(
            table, grads, ex, ey, et, ep, mask, latest)
        return stacked["cost"]

    c = dispatch()
    np.asarray(c)  # compile + settle
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(4):
            c = dispatch()
        np.asarray(c)
        best = min(best, (time.perf_counter() - t0) / 4)
    print(json.dumps({
        "dtype": str(align.SAMPLE_MXU_DTYPE.__name__),
        "window_scan_ms": round(best * 1e3, 2),
        "K": int(k),
    }))


if __name__ == "__main__":
    main()
