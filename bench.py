"""Benchmark: event-decode throughput on one TPU chip.

Measures the north-star metric (BASELINE.json): Mevents/s/chip turning raw
DVS events into an accumulated sensor image via the separable matmul splat
(evo_tpu.kernels.splat). Baseline = 1 Mev/s, the DAVIS240C real-time arrival
rate the reference cannot keep up with single-threaded (report §5.1: 2-60x
slower than real time), so vs_baseline is the real-time multiple.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from evo_tpu.kernels.splat import splat_image

    H, W = 180, 240
    n = 1 << 22  # 4.2M events per call
    chunk = 8192
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, W - 1, n), jnp.float32)
    y = jnp.asarray(rng.uniform(0, H - 1, n), jnp.float32)
    w = jnp.asarray(rng.choice([-1.0, 1.0], n).astype(np.float32))

    # warmup / compile (host fetch: block_until_ready does not reliably
    # synchronize through the remote-TPU tunnel, so timing must end with a
    # value pulled to host through a dependent chain)
    img = splat_image(x, y, w, H, W, mode="bilinear", chunk=chunk)
    float(jnp.sum(img))

    # several rounds, best-of (the remote tunnel has sporadic multi-ms
    # stalls unrelated to device compute)
    reps = 30
    best = 0.0
    for _ in range(5):
        t0 = time.perf_counter()
        wv = w
        for _ in range(reps):
            img = splat_image(x, y, wv, H, W, mode="bilinear", chunk=chunk)
            wv = wv + 0.0 * img[0, 0]  # serialize the chain
        float(jnp.sum(img))
        dt = time.perf_counter() - t0
        best = max(best, n * reps / dt / 1e6)
    mev_per_s = best

    print(
        json.dumps(
            {
                "metric": "event_decode_throughput",
                "value": round(mev_per_s, 2),
                "unit": "Mevents/s/chip",
                "vs_baseline": round(mev_per_s / 1.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
