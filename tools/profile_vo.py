"""Profile the VO critical path of the bench pipeline (VERDICT r3 item 2).

Runs the exact bench.py pipeline config but with inline VO, wrapping each
frontend stage (localize / bootstrap / triangulate / BA / Sim3-ATE) in
wall-clock timers, and reports where the 2.15 s of `stage_s.vo` goes.
"""

from __future__ import annotations

import collections
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

times = collections.defaultdict(float)
calls = collections.defaultdict(int)


def timed(name):
    def deco(fn):
        @functools.wraps(fn)
        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            times[name] += time.perf_counter() - t0
            calls[name] += 1
            return out
        return wrap
    return deco


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from evo_tpu.run.evaluator import Evaluator, EvaluatorParams
    from evo_tpu.io.davis import Davis240cDataset
    from evo_tpu.vo import frontend as fe

    # wrap stages
    F = fe.VisualOdometryFrontEnd
    F._localize_camera = timed("localize")(F._localize_camera)
    F._init_cameras = timed("bootstrap")(F._init_cameras)
    F._add_new_landmarks = timed("triangulate")(F._add_new_landmarks)
    F._optimize = timed("ba")(F._optimize)
    F._new_keyframe_candidate = timed("vo_total")(F._new_keyframe_candidate)
    F._sync_gt = timed("sync_gt")(F._sync_gt)
    fe.align_trajectories_sim3 = timed("sim3")(fe.align_trajectories_sim3)

    sys.path.insert(0, "/root/repo")
    import bench

    path = bench._sim_dataset_dir()

    def run_once():
        for k in list(times):
            del times[k]
        for k in list(calls):
            del calls[k]
        ds = Davis240cDataset(path)
        ev = Evaluator(ds, EvaluatorParams(output_dir="/tmp/evo_bench_out",
                                           async_vo=False))
        t0 = time.perf_counter()
        ev.run()
        ev.flush_pending()
        wall = time.perf_counter() - t0
        return ev, wall

    os.makedirs("/tmp/evo_bench_out", exist_ok=True)
    run_once()  # warmup
    ev, wall = run_once()
    s = ev.counters.summary()
    out = {
        "wall_s": round(wall, 3),
        "stage_s": {k[5:-2]: s[k] for k in s if k.startswith("time_")},
        "vo_sub_s": {k: round(v, 3) for k, v in sorted(times.items())},
        "vo_calls": dict(calls),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
