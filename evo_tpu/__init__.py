"""evo_tpu — TPU-native event-based visual odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C++
reference `nurlanov-zh/event-based-odomety`:

- event-based feature tracking (Harris detect + event-patch alignment),
- motion compensation of event streams (contrast / edge maximization),
- monocular visual odometry (RANSAC bootstrap, P3P localization,
  triangulation, sliding-window bundle adjustment, Sim(3) ATE alignment),
- DAVIS240C dataset ingestion, deterministic replay and evaluation tooling.

Architecture: bulk-synchronous processing of event *windows* as dense,
fixed-shape tensors (struct-of-arrays with validity masks) instead of the
reference's per-event callbacks; all solvers are batched Gauss-Newton /
Levenberg-Marquardt under `jit`/`vmap`; multi-device scaling via
`jax.sharding.Mesh` + `shard_map` (spatial sensor tiles + temporal windows).

Layer map (mirrors SURVEY.md §1):
    core/     dtypes, Lie groups (SE2/SO3/SE3/Sim3), camera model
    io/       DAVIS240C reader (native C++ parser + numpy fallback), replay
    kernels/  splat, warp, gradients, Harris, Lucas-Kanade, interpolation
    solve/    batched LM, RANSAC, triangulation, epipolar, P3P
    tracker/  patch table, detector, event-patch alignment, contrast-max
    vo/       keyframes, frontend policy, bundle adjustment, Sim3 aligner
    dist/     device mesh, spatial tiling, halo exchange, reductions
    run/      evaluator pipeline, CLI, artifact writers
"""

__version__ = "0.1.0"
