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


def _mp_worker(coordinator: str, num_processes: int, process_id: int,
               out_path: str, n_per_dev: int = 1 << 12,
               patches_per_dev: int = 4) -> None:
    """One process of the multi-process demo (run via
    ``python -m evo_tpu.dist.multihost mp-worker ...``).

    Initializes jax.distributed, builds the GLOBAL mesh over every process's
    devices, and runs the two production collectives across the process
    boundary:

    - sharded decode (`tiling.sharded_splat`): events batch-sharded over all
      global devices, psum'd accumulator — asserted bit-identical in shape
      and allclose in value to the single-device decode of the same stream;
    - sharded window scan (`detector._sharded_window_scan`): the patch table
      sharded over the global mesh, events/gradients replicated — each
      process checks its addressable output shards against the local
      single-device `align.process_window_scan` reference.

    Writes a JSON verdict to `out_path`. This is the executable proof that
    the `initialize()` entry point (the path a pod-slice launch uses) works:
    the reference has no communication backend at all (SURVEY §2.3 item 5).
    """
    import json

    t_start = time.perf_counter()
    initialize(coordinator, num_processes, process_id)
    import jax
    import jax.numpy as jnp

    from evo_tpu.dist import mesh as dmesh, tiling
    from evo_tpu.kernels.splat import splat_image
    from evo_tpu.tracker import align
    from evo_tpu.tracker import detector as det

    assert jax.process_count() == num_processes, (
        jax.process_count(), num_processes)
    devs = jax.devices()
    n_dev = len(devs)
    H, W = 180, 240
    m = dmesh.make_mesh(n_space=1, n_batch=n_dev)
    rep = dmesh.replicated(m)

    def to_global(a, sharding):
        # every process holds the same full array (same seed), so serving
        # any requested shard from it is exact regardless of device order
        return jax.make_array_from_callback(
            a.shape, sharding, lambda idx: a[idx]
        )

    # -- collective 1: cross-process sharded decode --------------------
    n = n_per_dev * n_dev
    rng = np.random.default_rng(0)
    x = rng.uniform(0, W - 1, n).astype(np.float32)
    y = rng.uniform(0, H - 1, n).astype(np.float32)
    w = rng.choice([-1.0, 1.0], n).astype(np.float32)
    bsh = dmesh.batch_sharded(m)
    t0 = time.perf_counter()
    img = tiling.sharded_splat(
        m, to_global(x, bsh), to_global(y, bsh), to_global(w, bsh), H, W
    )
    got = np.asarray(img.addressable_data(0))
    decode_s = time.perf_counter() - t0
    ref = np.asarray(splat_image(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), H, W
    ))
    decode_err = float(np.abs(got - ref).max())

    # -- collective 2: cross-process sharded window scan ---------------
    cap = patches_per_dev * n_dev
    table = _ready_table(np.random.default_rng(1), cap, H, W)
    k, c = 2, 2048
    erng = np.random.default_rng(2)
    ex = erng.uniform(0, W - 1, (k, c)).astype(np.float32)
    ey = erng.uniform(0, H - 1, (k, c)).astype(np.float32)
    et = np.sort(erng.uniform(0, 0.05, (k, c)), axis=1).astype(np.float32)
    ep = erng.choice([-1.0, 1.0], (k, c)).astype(np.float32)
    mask = np.ones((k, c), bool)
    grads = erng.normal(0, 0.1, (4, 2, H, W)).astype(np.float32)

    from jax.sharding import NamedSharding, PartitionSpec as P

    tsh = NamedSharding(m, P((dmesh.SPACE_AXIS, dmesh.BATCH_AXIS)))
    table_g = jax.tree.map(lambda a: to_global(np.asarray(a), tsh), table)
    scan = det._sharded_window_scan(m)
    out_table, stacked = scan(
        table_g, to_global(grads, rep),
        to_global(ex, rep), to_global(ey, rep), to_global(et, rep),
        to_global(ep, rep), to_global(mask, rep), to_global(grads[0], rep),
    )
    ref_table, ref_stacked = align.process_window_scan(
        jax.tree.map(jnp.asarray, table), jnp.asarray(grads),
        jnp.asarray(ex), jnp.asarray(ey), jnp.asarray(et),
        jnp.asarray(ep), jnp.asarray(mask), jnp.asarray(grads[0]),
    )
    scan_err = 0.0
    ref_cost = np.asarray(ref_stacked["cost"])
    for shard in stacked["cost"].addressable_shards:
        local = np.asarray(shard.data)
        scan_err = max(scan_err, float(np.abs(
            local - ref_cost[shard.index]
        ).max()))
    ref_center = np.asarray(ref_table.center)
    for shard in out_table.center.addressable_shards:
        local = np.asarray(shard.data)
        scan_err = max(scan_err, float(np.abs(
            local - ref_center[shard.index]
        ).max()))

    result = {
        "process_id": process_id,
        "num_processes": int(jax.process_count()),
        "global_devices": n_dev,
        "local_devices": len(jax.local_devices()),
        "decode_max_abs_err": decode_err,
        "decode_s": round(decode_s, 4),
        "scan_max_abs_err": scan_err,
        "wall_s": round(time.perf_counter() - t_start, 2),
        "ok": bool(decode_err < 2e-4 and scan_err < 2e-3),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)


def launch_multiprocess(n_procs: int = 2, local_devices: int = 2,
                        timeout_s: float = 300.0, workdir: str | None = None):
    """Spawn `n_procs` OS processes that each call
    `jax.distributed.initialize` against a local coordinator and run the
    cross-process collective parity demo (`_mp_worker`). Returns the list of
    per-process verdict dicts.

    This is the CI-executable stand-in for a pod-slice launch: same entry
    point (`initialize`), same global-mesh construction, same collectives —
    only the transport differs (TCP on localhost vs ICI/DCN)."""
    import json
    import socket
    import subprocess
    import sys
    import tempfile

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    tmp = workdir or tempfile.mkdtemp(prefix="evo_mp_")
    os.makedirs(tmp, exist_ok=True)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    procs = []
    outs = []
    for pid in range(n_procs):
        out = os.path.join(tmp, f"mp_{pid}.json")
        outs.append(out)
        env = dict(os.environ)
        # pure-CPU jax with a forced local device count; strip the axon
        # remote-TPU plugin trigger (its tunnel client deadlocks forked
        # CPU runs — see tests/conftest.py)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={local_devices}"
        )
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
            repo_root, ".jax_cache")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "evo_tpu.dist.multihost", "mp-worker",
             coordinator, str(n_procs), str(pid), out],
            env=env, cwd=repo_root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    results = []
    failed = []
    for pid, p in enumerate(procs):
        try:
            stdout, _ = p.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(f"multiprocess worker {pid} timed out")
        if p.returncode != 0 or not os.path.exists(outs[pid]):
            failed.append((pid, p.returncode,
                           stdout.decode(errors="replace")[-2000:]))
            continue
        with open(outs[pid]) as f:
            results.append(json.load(f))
    if failed:
        msgs = "\n".join(
            f"worker {pid} rc={rc}:\n{tail}" for pid, rc, tail in failed
        )
        raise RuntimeError(f"multiprocess workers failed:\n{msgs}")
    return results


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


def _ready_table(rng, cap: int, height: int, width: int):
    """A patch table with every row alive, initialized, and ready (full
    event ring, counter past READY_COUNTER) — the worst-case solve load for
    the window-scan scaling bench."""
    import dataclasses

    import jax.numpy as jnp

    from evo_tpu.tracker import patch_state as ps

    t = ps.empty_table(cap)
    e = t.ev_t.shape[1]
    cx = rng.uniform(40, width - 40, cap).astype(np.float32)
    cy = rng.uniform(40, height - 40, cap).astype(np.float32)
    center = np.stack([cx, cy], axis=-1)
    ex = np.round(cx[:, None] + rng.uniform(-10, 10, (cap, e))).astype(np.float32)
    ey = np.round(cy[:, None] + rng.uniform(-10, 10, (cap, e))).astype(np.float32)
    return dataclasses.replace(
        t,
        alive=jnp.ones(cap, bool),
        initialized=jnp.ones(cap, bool),
        track_id=jnp.arange(cap, dtype=jnp.int32),
        center=jnp.asarray(center),
        init_pt=jnp.asarray(center),
        num_of_events=jnp.full(cap, ps.MIN_NUM_EVENTS, jnp.int32),
        counter=jnp.full(cap, ps.READY_COUNTER + 5, jnp.int32),
        ev_t=jnp.asarray(np.sort(rng.uniform(0, 0.05, (cap, e)), axis=1), jnp.float32),
        ev_x=jnp.asarray(ex),
        ev_y=jnp.asarray(ey),
        ev_p=jnp.asarray(rng.choice([-1.0, 1.0], (cap, e)), jnp.float32),
        ev_count=jnp.full(cap, e, jnp.int32),
        grad_slot=jnp.asarray(np.arange(cap) % 4, jnp.int32),
    )


def measure_scaling_pipeline(height: int = 180, width: int = 240,
                             repeats: int = 3,
                             patches_per_device: int = 16,
                             events_per_window: int = 20_000,
                             counts: tuple = (1, 2, 4, 8)):
    """comm_efficiency sweep for the two PRODUCTION collectives beyond the
    decode splat (VERDICT r2 item 6):

    - ``window_scan``: the sharded tracker event path
      (detector._sharded_window_scan) — patch table weak-scaled over the
      batch axis (``patches_per_device`` ready patches per device), events
      and the gradient store replicated. comm_efficiency =
      t_single(n·P patches, 1 device) / t_sharded(same table, n devices).
    - ``tile_solve``: the space-sharded contrast-max motion-field solve
      (dist.tiling.sharded_tile_solve_data, tile=15 → 12×16 grid so the
      column count divides 1/2/4/8) vs compensate.solve_motion_field on one
      device — strong scaling at equal total work, so the collective cost
      (psum'd normal system + TV halo) is the only difference.

    Both follow measure_scaling's convention: ratios near/above 1 mean the
    sharded path costs no more than one device doing all the work on the
    same physical cores — the predictor for pod-slice scaling where shards
    own real chips.
    """
    import jax
    import jax.numpy as jnp

    from evo_tpu.dist import mesh as dmesh, tiling
    from evo_tpu.tracker import align, compensate
    from evo_tpu.tracker import detector as det

    rng = np.random.default_rng(0)
    all_devs = jax.devices()
    counts = [n for n in counts if n <= len(all_devs)]

    def best_time(fn):
        fn()
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # shared inputs: one window of sub-batched events + a tiny grad store
    k, c = 4, events_per_window // 4
    ex = jnp.asarray(rng.uniform(0, width - 1, (k, c)), jnp.float32)
    ey = jnp.asarray(rng.uniform(0, height - 1, (k, c)), jnp.float32)
    et = jnp.asarray(np.sort(rng.uniform(0, 0.05, (k, c)), axis=1), jnp.float32)
    ep = jnp.asarray(rng.choice([-1.0, 1.0], (k, c)), jnp.float32)
    mask = jnp.ones((k, c), bool)
    grads = jnp.asarray(rng.normal(0, 0.1, (4, 2, height, width)), jnp.float32)

    scan_res: dict[int, dict] = {}
    for n in counts:
        m = dmesh.make_mesh(n_space=1, n_batch=n, devices=all_devs[:n])
        cap = patches_per_device * n
        table = _ready_table(rng, cap, height, width)
        sharded = det._sharded_window_scan(m)

        def run_sharded():
            tbl, stacked = sharded(table, grads, ex, ey, et, ep, mask, grads[0])
            return float(jnp.sum(stacked["cost"]))

        def run_single():
            tbl, stacked = align.process_window_scan(
                table, grads, ex, ey, et, ep, mask, grads[0]
            )
            return float(jnp.sum(stacked["cost"]))

        t_shard = best_time(run_sharded)
        t_single = best_time(run_single)
        scan_res[n] = {
            "patches": cap,
            "ms_sharded": round(t_shard * 1e3, 1),
            "ms_single": round(t_single * 1e3, 1),
            "comm_efficiency": round(t_single / t_shard, 3),
        }

    # tile solve: 12x16 grid (tile=15) so tx divides every device count
    p = compensate.CompensateParams(tile=15, max_iters=10)
    n_ev = 40_000
    x = rng.uniform(0, width - 1, n_ev)
    y = rng.uniform(0, height - 1, n_ev)
    t_us = np.sort(rng.uniform(0, 50_000, n_ev))
    tile_data, edge_idx, ty_n, tx_n, _, _ = compensate.build_tile_data(
        x, y, t_us, p, height, width
    )
    solve_kw = dict(
        tile=p.tile, scale=p.scale, tv_weight=p.tv_weight,
        tv_huber=p.tv_huber, max_iters=p.max_iters, loss=p.loss,
    )
    tile_res: dict[int, dict] = {}
    for n in counts:
        m = dmesh.make_mesh(n_space=n, n_batch=1, devices=all_devs[:n])

        def run_sharded():
            vel, cost, _ = tiling.sharded_tile_solve_data(
                m, tile_data, ty=ty_n, tx=tx_n, **solve_kw
            )
            return float(cost)

        def run_single():
            vel, cost, _ = compensate.solve_motion_field(
                tile_data, edge_idx, **solve_kw
            )
            return float(cost)

        t_shard = best_time(run_sharded)
        t_single = best_time(run_single)
        tile_res[n] = {
            "tiles": ty_n * tx_n,
            "ms_sharded": round(t_shard * 1e3, 1),
            "ms_single": round(t_single * 1e3, 1),
            "comm_efficiency": round(t_single / t_shard, 3),
        }
    return {"window_scan": scan_res, "tile_solve": tile_res}


def write_scaling_artifact(path: str = "SCALING.json", **kwargs) -> dict:
    """Run the scaling sweep and record it (BASELINE.json north star:
    >= 80 % scaling efficiency at 2 hosts; on the 2-core CI host the
    virtual-mesh weak-scaling number is core-contention-bound, so the
    artifact carries both views — see `measure_scaling`)."""
    import json
    import os

    import jax

    res = measure_scaling(**kwargs)
    pipe = measure_scaling_pipeline()
    try:
        mp = launch_multiprocess(n_procs=2, local_devices=2)
        mp_row = {
            "n_processes": 2,
            "global_devices": mp[0]["global_devices"],
            "ok": all(r["ok"] for r in mp),
            "decode_max_abs_err": max(r["decode_max_abs_err"] for r in mp),
            "scan_max_abs_err": max(r["scan_max_abs_err"] for r in mp),
            "decode_s": max(r["decode_s"] for r in mp),
            "note": "2 OS processes, jax.distributed.initialize over a "
                    "localhost coordinator, 2 forced CPU devices each; "
                    "cross-process psum decode + sharded window scan parity "
                    "vs single device (the pod-slice launch path, executed)",
        }
    except Exception as e:  # pragma: no cover - environment-dependent
        mp_row = {"ok": False, "error": f"{e.__class__.__name__}: {e}"}
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
            "predictor for real pod-slice weak scaling. tile_solve ships "
            "compressed per-tile/per-edge system pieces by all_gather and "
            "factorizes the tiny dense system on ONE device (psum "
            "broadcast), so no replicated assembly/cho_factor inflates the "
            "virtual-mesh numbers (the round-3 8-device collapse)."
        ),
        "multiprocess": mp_row,
        "scaling": {str(k): v for k, v in res.items()},
        "pipeline_collectives": {
            kernel: {str(k): v for k, v in per_n.items()}
            for kernel, per_n in pipe.items()
        },
    }
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    return artifact


if __name__ == "__main__":
    import json as _json
    import sys as _sys

    if len(_sys.argv) > 1 and _sys.argv[1] == "mp-worker":
        coord, nproc, pid, outp = _sys.argv[2:6]
        _mp_worker(coord, int(nproc), int(pid), outp)
    else:
        out = _sys.argv[1] if len(_sys.argv) > 1 else "SCALING.json"
        print(_json.dumps(write_scaling_artifact(out), indent=1))
