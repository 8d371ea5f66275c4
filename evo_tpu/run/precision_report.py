"""PRECISION artifact: f32 vs compensated vs f64-oracle BA assembly A/B.

The reference runs Ceres entirely in f64 (`visual_odometry.cpp:416-497`);
the TPU build is f32 with an optional two-float compensated assembly
(`VoParams.ba_compensated` → `vo.ba.ba_solve(compensated=...)`). This module
records the evidence that picks the default (VERDICT r2 item 10):

- build a production-scale sliding-window BA problem (20 keyframes — the
  reference's window cap, `visual_odometry.h:29` — with the observation
  density a 100-feature tracker produces over such a window);
- assemble the normal-equation blocks three ways: plain f32 scatter-add,
  two-float compensated (solve.precision), and an f64-summation oracle over
  the SAME f32 per-observation blocks (isolating summation error, the only
  thing the compensated path changes);
- run the full LM solve both ways and compare trajectories and costs;
- time both variants.

Run: `python -m evo_tpu.run.precision_report [PRECISION.json]`.

Note BA re-linearizes every window from the current state — summation error
does NOT compound across windows, so per-window assembly error bounds the
whole-pipeline effect.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _problem(rng, F=20, L=600, obs_per_lm=8):
    import jax
    import jax.numpy as jnp

    from evo_tpu.core import camera, lie
    from evo_tpu.core.types import CalibParams

    calib = CalibParams(fx=199.0, fy=198.0, cx=119.5, cy=89.5,
                        width=240, height=180)
    intr = jnp.asarray(calib.to_array())
    poses = np.tile([1.0, 0, 0, 0, 0, 0, 0], (F, 1)).astype(np.float32)
    poses[:, 4] = np.arange(F) * 0.04
    poses[:, 5] = 0.02 * np.sin(np.arange(F))
    pts = np.stack(
        [rng.uniform(-1.2, 1.2, L), rng.uniform(-0.9, 0.9, L),
         rng.uniform(2.5, 5.0, L)], -1,
    ).astype(np.float32)
    O = L * obs_per_lm
    of = np.concatenate([
        (rng.integers(0, F - obs_per_lm) + np.arange(obs_per_lm))
        for _ in range(L)
    ]).astype(np.int32)
    ol = np.repeat(np.arange(L), obs_per_lm).astype(np.int32)
    p_cam = lie.se3_apply(
        jax.vmap(lie.se3_inverse)(jnp.asarray(poses))[of], jnp.asarray(pts)[ol]
    )
    op = np.asarray(camera.project(intr, p_cam)) + rng.normal(0, 0.4, (O, 2))
    om = np.ones(O, bool)
    fixed = np.zeros(F, bool)
    fixed[:2] = True
    return (jnp.asarray(poses), jnp.asarray(pts), intr, jnp.asarray(of),
            jnp.asarray(ol), jnp.asarray(op, jnp.float32), jnp.asarray(om),
            jnp.asarray(fixed))


def _assembly_errors(args):
    """Max relative error of plain vs compensated block assembly against an
    f64 summation oracle over identical f32 per-obs blocks."""
    import jax
    import jax.numpy as jnp

    from evo_tpu.solve.lm import huber_weights
    from evo_tpu.solve.precision import compensated_scatter_add
    from evo_tpu.vo import ba

    poses, landmarks, intr, of, ol, op, om, fixed = args
    F = poses.shape[0]
    L = landmarks.shape[0]
    r, Jp, Jl = jax.vmap(ba._obs_linearize, in_axes=(0, 0, None, 0))(
        poses[of], landmarks[ol], intr, op
    )
    s = jnp.sum(r * r, axis=-1)
    w = huber_weights(s, ba.HUBER) * om.astype(jnp.float32)
    Jp = jnp.where(fixed[of][:, None, None], 0.0, Jp)
    v_Hpp = jnp.einsum("oij,oik->ojk", Jp * w[:, None, None], Jp)
    v_bp = jnp.einsum("oij,oi->oj", Jp, r * w[:, None])

    out = {}
    for name, v, idx, n_out in (
        ("Hpp", v_Hpp, of, F),
        ("bp", v_bp, of, F),
    ):
        v_np = np.asarray(v, np.float64)
        oracle = np.zeros((n_out,) + v_np.shape[1:], np.float64)
        np.add.at(oracle, np.asarray(idx), v_np)
        plain = np.asarray(
            jnp.zeros((n_out,) + v.shape[1:], jnp.float32).at[idx].add(v),
            np.float64,
        )
        comp = np.asarray(compensated_scatter_add(idx, v, n_out), np.float64)
        scale = np.abs(oracle).max() + 1e-12
        out[name] = {
            "plain_f32_max_rel_err": float(np.abs(plain - oracle).max() / scale),
            "compensated_max_rel_err": float(np.abs(comp - oracle).max() / scale),
        }
    return out


def _timed_solve(args, compensated: bool, iters: int = 30, reps: int = 3):
    from evo_tpu.vo import ba

    p, l, c, c0, _ = ba.ba_solve(*args, num_iters=iters, compensated=compensated)
    float(c)  # compile + land
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        p, l, c, c0, _ = ba.ba_solve(*args, num_iters=iters, compensated=compensated)
        float(c)
        best = min(best, time.perf_counter() - t0)
    return np.asarray(p, np.float64), float(c), float(c0), best


def build_report() -> dict:
    import jax

    rng = np.random.default_rng(7)
    args = _problem(rng)
    errs = _assembly_errors(args)
    p_plain, c_plain, c0, t_plain = _timed_solve(args, False)
    p_comp, c_comp, _, t_comp = _timed_solve(args, True)
    pose_diff = float(np.abs(p_plain - p_comp).max())
    report = {
        "backend": jax.default_backend(),
        "problem": {"frames": 20, "landmarks": 600, "observations": 4800},
        "assembly_vs_f64_oracle": errs,
        "solve": {
            "initial_cost": c0,
            "final_cost_plain": c_plain,
            "final_cost_compensated": c_comp,
            "max_pose_param_diff": pose_diff,
            "time_s_plain": round(t_plain, 4),
            "time_s_compensated": round(t_comp, 4),
            "compensated_overhead_pct": round(
                100.0 * (t_comp - t_plain) / t_plain, 1
            ),
        },
        "decision": None,  # filled below
    }
    # cost agreement is the accuracy signal; raw pose diff at equal cost is
    # LM path noise (different summation order -> different but equally
    # valid f32 trajectories through the damped iteration)
    cost_rel_diff = abs(c_plain - c_comp) / max(abs(c_plain), 1e-12)
    report["solve"]["final_cost_rel_diff"] = float(cost_rel_diff)
    plain_err = max(e["plain_f32_max_rel_err"] for e in errs.values())
    overhead = report["solve"]["compensated_overhead_pct"]
    if plain_err < 1e-5 and cost_rel_diff < 1e-4 and pose_diff < 1e-2:
        report["decision"] = (
            f"ba_compensated stays DEFAULT-OFF: plain f32 assembly is within "
            f"{plain_err:.1e} of the f64 summation oracle at the production "
            f"window size (20 kf x ~4.8k obs — summation depth per block is "
            f"only a few hundred), both variants converge to the same robust "
            f"cost to {cost_rel_diff:.1e} relative (pose params differ by "
            f"{pose_diff:.1e} — LM path noise at equal cost, not an accuracy "
            f"gap), and BA re-linearizes each window so the error cannot "
            f"compound. The compensated path ({overhead:+.1f}% solve time) "
            f"remains available for deeper reductions via "
            f"VoParams.ba_compensated."
        )
    else:
        report["decision"] = (
            f"ba_compensated flipped DEFAULT-ON: plain f32 assembly drifts "
            f"{plain_err:.1e} from the f64 oracle and moves the solution by "
            f"{pose_diff:.1e} at production scale; overhead is {overhead:.1f}%."
        )
    return report


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "PRECISION.json"
    rep = build_report()
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep, indent=1))
