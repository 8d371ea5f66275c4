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
                    width: int = 240, repeats: int = 5):
    """Weak-scaling sweep of the sharded decode over 1..N devices.

    Returns {n_devices: {"mev_per_s": ..., "efficiency": ...}} where
    efficiency = throughput(n) / (n * throughput(1)).
    """
    import jax
    import jax.numpy as jnp

    from evo_tpu.dist import mesh as dmesh, tiling

    rng = np.random.default_rng(0)
    results: dict[int, dict] = {}
    all_devs = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(all_devs)]
    base = None
    for n in counts:
        m = dmesh.make_mesh(n_space=1, n_batch=n, devices=all_devs[:n])
        n_ev = events_per_device * n
        x = jnp.asarray(rng.uniform(0, width - 1, n_ev), jnp.float32)
        y = jnp.asarray(rng.uniform(0, height - 1, n_ev), jnp.float32)
        w = jnp.asarray(rng.choice([-1.0, 1.0], n_ev), jnp.float32)
        img = tiling.sharded_splat(m, x, y, w, height, width, chunk=4096)
        float(jnp.sum(img))  # compile + sync
        best = 0.0
        for _ in range(repeats):
            t0 = time.perf_counter()
            img = tiling.sharded_splat(m, x, y, w, height, width, chunk=4096)
            float(jnp.sum(img))
            dt = time.perf_counter() - t0
            best = max(best, n_ev / dt / 1e6)
        if base is None:
            base = best
        results[n] = {
            "mev_per_s": round(best, 1),
            "efficiency": round(best / (n * base), 3),
        }
    return results
