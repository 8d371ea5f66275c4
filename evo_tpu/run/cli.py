"""Command-line entry point.

Counterpart of the reference's `tools/visualizer/main.cpp:16-140` minus the
Pangolin GUI (out of scope for the TPU core — SURVEY.md §2.2): the same
`--dataset` wiring of reader → replay → evaluator, plus experiment-mode
flags, artifact output, and optional PNG dumps of the compensated event
image (the offline replacement for the GUI views).

Usage:
    python -m evo_tpu.run.cli --dataset /path/to/shapes_6dof --output-dir /tmp
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="evo_tpu event-based visual odometry")
    ap.add_argument("--dataset", required=True, help="DAVIS240C dataset directory")
    ap.add_argument("--output-dir", default="/tmp", help="artifact directory")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--tracker-experiment", action="store_true",
                    help="freeze detection after 2 frames (feature-age study)")
    ap.add_argument("--vo-experiment", action="store_true",
                    help="bypass tracker; replay trajectory.txt into VO")
    ap.add_argument("--no-compensation", action="store_true",
                    help="skip whole-image contrast compensation")
    ap.add_argument("--dump-images", action="store_true",
                    help="write compensated event image PNGs to output dir")
    ap.add_argument("--compensation-mode", choices=("contrast", "tracks"),
                    default="contrast")
    ap.add_argument("--checkpoint", default=None,
                    help="write a checkpoint .npz here when done")
    ap.add_argument("--resume", default=None,
                    help="resume from a checkpoint .npz")
    ap.add_argument("--viz", action="store_true",
                    help="render trajectory plot + patch debug views")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler trace into this directory")
    ap.add_argument("--watchdog", action="store_true",
                    help="enable failure detection/recovery (run.watchdog)")
    ap.add_argument("--auto-checkpoint-every", type=int, default=0,
                    help="windows between watchdog auto-checkpoints (0=off)")
    ap.add_argument("--no-async-vo", action="store_true",
                    help="process VO keyframes inline instead of on the "
                         "worker thread (debugging aid; slower)")
    ap.add_argument("--temporal-batch", type=int, default=0,
                    help="buffer this many compensation windows and solve "
                         "them in one dispatch sharded over the mesh batch "
                         "axis (P3; 0 = per-window cadence)")
    ap.add_argument("--pipeline-depth", type=int, default=8,
                    help="max frame windows in flight on the device")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(levelname).1s %(name)s: %(message)s",
    )

    from evo_tpu.io.davis import Davis240cDataset
    from evo_tpu.run.evaluator import Evaluator, EvaluatorParams

    t0 = time.perf_counter()
    os.makedirs(args.output_dir, exist_ok=True)
    dataset = Davis240cDataset(args.dataset)
    params = EvaluatorParams(
        output_dir=args.output_dir,
        tracker_experiment=args.tracker_experiment,
        vo_experiment=args.vo_experiment,
        run_compensation=not args.no_compensation,
        compensation_mode=args.compensation_mode,
        watchdog=args.watchdog or args.auto_checkpoint_every > 0,
        async_vo=not args.no_async_vo,
        temporal_batch=args.temporal_batch,
        pipeline_depth=args.pipeline_depth,
    )
    if args.auto_checkpoint_every > 0:
        from evo_tpu.run.watchdog import WatchdogParams

        params.watchdog_params = WatchdogParams(
            auto_checkpoint_every=args.auto_checkpoint_every,
            checkpoint_path=f"{args.output_dir}/autockpt.npz",
        )
    if args.resume:
        from evo_tpu.run import checkpoint as ckpt

        ev = ckpt.load_checkpoint(args.resume, dataset, params)
        start = ev.image_num
    else:
        ev = Evaluator(dataset, params)
        start = 0

    import contextlib

    prof = contextlib.nullcontext()
    if args.profile_dir:
        from evo_tpu.run.metrics import profile_trace

        prof = profile_trace(args.profile_dir)
    with prof:
        ev.run(max_frames=args.max_frames, start_frame=start)
    paths = ev.finish()
    if args.checkpoint:
        from evo_tpu.run import checkpoint as ckpt

        paths["checkpoint"] = ckpt.save_checkpoint(args.checkpoint, ev)
    if args.viz:
        from evo_tpu.run import viz

        if ev.vo is not None:
            p = viz.plot_trajectories(f"{args.output_dir}/trajectory_plot.png", ev.vo)
            if p:
                paths["trajectory_plot"] = p
            p3 = viz.render_scene_3d(f"{args.output_dir}/scene_3d.png", ev.vo)
            if p3:
                paths["scene_3d"] = p3
        if ev.tracker.num_live > 0:
            paths.update(viz.save_patch_views(args.output_dir, ev.tracker))
    dt = time.perf_counter() - t0

    if args.dump_images and ev.compensated_image is not None:
        from PIL import Image

        img = ev.compensated_image
        norm = (255 * img / max(1e-9, img.max())).astype("uint8")
        out = f"{args.output_dir}/compensated_event_image.png"
        Image.fromarray(norm, mode="L").save(out)
        paths["compensated_image"] = out

    n_ev = len(dataset.events)
    print(f"processed {n_ev} events, {ev.image_num} frames in {dt:.1f}s "
          f"({n_ev / max(dt, 1e-9) / 1e6:.2f} Mev/s end-to-end)")
    for name, path in paths.items():
        print(f"  {name}: {path}")
    if ev.vo is not None and ev.vo.last_ate is not None:
        a = ev.vo.last_ate
        print(f"  ATE rmse={a.rmse:.4f} mean={a.mean:.4f} max={a.max:.4f} (n={a.count})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
