"""Multi-host initialization and scaling measurement.

The communication backend the reference lacks entirely (SURVEY.md §2.3 item
5): on a TPU pod slice, each host process calls `initialize()` (a thin
wrapper over `jax.distributed.initialize`) and then builds the global
(space, batch) mesh over `jax.devices()` — collectives ride ICI within the
slice and DCN across slices automatically via XLA.

Typical pod-slice launch (one process per host):

    EVO_COORD=host0:8476 EVO_NUM_PROCS=2 EVO_PROC_ID=$i python train.py

`measure_scaling` runs the sharded decode at several device counts and
reports weak-scaling efficiency (the BASELINE.json "scaling efficiency at N
hosts" metric); on CI it runs against the forced CPU mesh.
"""

from __future__ import annotations

import os
import time

import numpy as np


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or EVO_COORD / EVO_NUM_PROCS /
    EVO_PROC_ID env vars. No-op for single-process runs."""
    import jax

    coordinator = coordinator or os.environ.get("EVO_COORD")
    if coordinator is None:
        return
    num_processes = num_processes or int(os.environ.get("EVO_NUM_PROCS", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("EVO_PROC_ID", "0")
    )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def measure_scaling(events_per_device: int = 1 << 18, height: int = 180,
                    width: int = 240, repeats: int = 5, chunk: int = 4096):
    """Weak-scaling sweep of the sharded decode over 1..N devices.

    Returns {n_devices: {...}} with two efficiency views:

    - ``efficiency``: classic weak scaling, throughput(n)/(n*throughput(1)).
      On a *virtual* CPU mesh (xla_force_host_platform_device_count) the n
      devices time-share the same physical cores, so this number is bounded
      by cores/n, not by the communication layer — it reflects the test
      host, not the design.
    - ``comm_efficiency``: collective overhead isolated from core
      contention — t_single(n*E events, 1 device) / t_sharded(n*E events,
      n devices). Both runs use the same physical cores and the same total
      work; any ratio below 1 is the cost of psum + shard orchestration.
      This is the number that predicts pod-slice weak scaling, where each
      shard really does own its own chip.
    """
    import jax
    import jax.numpy as jnp

    from evo_tpu.dist import mesh as dmesh, tiling
    from evo_tpu.kernels.splat import splat_image

    rng = np.random.default_rng(0)
    results: dict[int, dict] = {}
    all_devs = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(all_devs)]

    def best_time(fn):
        fn()  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    base = None
    for n in counts:
        m = dmesh.make_mesh(n_space=1, n_batch=n, devices=all_devs[:n])
        n_ev = events_per_device * n
        x = jnp.asarray(rng.uniform(0, width - 1, n_ev), jnp.float32)
        y = jnp.asarray(rng.uniform(0, height - 1, n_ev), jnp.float32)
        w = jnp.asarray(rng.choice([-1.0, 1.0], n_ev), jnp.float32)

        t_shard = best_time(
            lambda: float(jnp.sum(
                tiling.sharded_splat(m, x, y, w, height, width, chunk=chunk)
            ))
        )
        x1 = jax.device_put(x, all_devs[0])
        y1 = jax.device_put(y, all_devs[0])
        w1 = jax.device_put(w, all_devs[0])
        t_single = best_time(
            lambda: float(jnp.sum(
                splat_image(x1, y1, w1, height, width, chunk=chunk)
            ))
        )
        thr = n_ev / t_shard / 1e6
        if base is None:
            base = thr
        results[n] = {
            "mev_per_s": round(thr, 1),
            "efficiency": round(thr / (n * base), 3),
            "comm_efficiency": round(t_single / t_shard, 3),
        }
    return results


def write_scaling_artifact(path: str = "SCALING.json", **kwargs) -> dict:
    """Run the scaling sweep and record it (BASELINE.json north star:
    >= 80 % scaling efficiency at 2 hosts; on the 2-core CI host the
    virtual-mesh weak-scaling number is core-contention-bound, so the
    artifact carries both views — see `measure_scaling`)."""
    import json
    import os

    import jax

    res = measure_scaling(**kwargs)
    artifact = {
        "backend": jax.default_backend(),
        "n_devices": len(jax.devices()),
        "physical_cpus": os.cpu_count(),
        "device_kind": jax.devices()[0].device_kind,
        "note": (
            "efficiency = weak scaling on this host's devices; on a forced "
            "virtual CPU mesh it is bounded by physical_cpus/n (core "
            "time-sharing), not by the communication design. "
            "comm_efficiency isolates the collective/shard overhead at "
            "equal physical resources and equal total work; it is the "
            "predictor for real pod-slice weak scaling."
        ),
        "scaling": {str(k): v for k, v in res.items()},
    }
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    return artifact


if __name__ == "__main__":
    import json as _json
    import sys as _sys

    out = _sys.argv[1] if len(_sys.argv) > 1 else "SCALING.json"
    print(_json.dumps(write_scaling_artifact(out), indent=1))
