"""Microbenchmark ba_solve at the bench pipeline's end-of-run shape
(F=21, L~512, O=2048 — the shapes profile_vo.py sees) on the VO geometry
backend (host CPU), to find the per-iteration cost and its dominant term.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth(F, L, O, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    poses = np.zeros((F, 7), np.float32)
    poses[:, 0] = 1.0
    poses[:, 4] = np.linspace(0, 1.0, F)  # translate along x
    lms = rng.uniform([-2, -2, 3], [2, 2, 8], (L, 3)).astype(np.float32)
    obs_f = rng.integers(0, F, O).astype(np.int32)
    obs_l = rng.integers(0, L, O).astype(np.int32)
    intr = np.array([120.0, 120.0, 120.0, 90.0, 0, 0, 0, 0, 0], np.float32)
    return poses, lms, intr, obs_f, obs_l


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from evo_tpu.core import camera, lie
    from evo_tpu.vo import ba

    F, L, O = 21, 512, 2048
    poses, lms, intr, obs_f, obs_l = synth(F, L, O)
    # project ground-truth observations + noise
    p_cam = []
    for o in range(O):
        T = poses[obs_f[o]]
        X = lms[obs_l[o]]
        p_cam.append(np.asarray(
            camera.project(jnp.asarray(intr),
                           lie.se3_apply(lie.se3_inverse(jnp.asarray(T)),
                                         jnp.asarray(X)))))
    obs_p = np.stack(p_cam).astype(np.float32)
    obs_p += np.random.default_rng(1).normal(0, 0.5, obs_p.shape).astype(np.float32)
    obs_m = np.ones(O, bool)
    fixed = np.zeros(F, bool)
    fixed[:2] = True

    args = [jnp.asarray(a) for a in
            (poses, lms, intr, obs_f, obs_l, obs_p, obs_m, fixed)]

    for iters in (1, 5, 10, 20):
        r = ba.ba_solve(*args, num_iters=iters)
        jax.block_until_ready(r)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            r = ba.ba_solve(*args, num_iters=iters)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        print(f"iters={iters:3d}  wall={best*1e3:7.2f} ms  n_it={int(r[4])} "
              f"cost {float(r[3]):.1f} -> {float(r[2]):.1f}")


if __name__ == "__main__":
    main()
