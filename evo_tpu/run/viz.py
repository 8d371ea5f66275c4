"""Offline visualization — the TPU-side replacement for the Pangolin GUI.

The reference's visualizer (`tools/visualizer/src/visualizer.cpp`) shows
four image views (original + overlays, predicted nabla, integrated nabla,
cost map), a 3D scene with camera frusta and landmarks, raw-event overlays
and trajectory trails. Interactive GL is out of scope for the TPU core
(SURVEY.md §2.2), so these render to PNG files / matplotlib figures from
the same state.
"""

from __future__ import annotations

import os

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    lo, hi = float(np.min(img)), float(np.max(img))
    if hi - lo < 1e-12:
        return np.zeros_like(img, np.uint8)
    return ((img - lo) / (hi - lo) * 255).astype(np.uint8)


def save_gray(path: str, img: np.ndarray) -> str:
    from PIL import Image

    Image.fromarray(_to_u8(np.asarray(img)), mode="L").save(path)
    return path


def render_feature_overlay(frame: np.ndarray, tracker, trail_len: int = 20):
    """Frame with patch rects and trajectory trails burned in (RGB array) —
    the reference's main view (`visualizer.cpp:225-341`)."""
    from evo_tpu.tracker import patch_state as ps

    h, w = frame.shape
    rgb = np.stack([_to_u8(frame)] * 3, axis=-1)
    mirror = ps.host_mirror(tracker.table)
    for i in np.flatnonzero(mirror["alive"]):
        cx, cy = mirror["center"][i]
        x0 = int(np.clip(cx - ps.PATCH_EXTENT, 0, w - 1))
        x1 = int(np.clip(cx + ps.PATCH_EXTENT, 0, w - 1))
        y0 = int(np.clip(cy - ps.PATCH_EXTENT, 0, h - 1))
        y1 = int(np.clip(cy + ps.PATCH_EXTENT, 0, h - 1))
        rgb[y0, x0:x1, 1] = 255
        rgb[y1, x0:x1, 1] = 255
        rgb[y0:y1, x0, 1] = 255
        rgb[y0:y1, x1, 1] = 255
        tid = int(mirror["track_id"][i])
        trail = tracker.trajectories.get(tid, [])[-trail_len:]
        for _, tx, ty in trail:
            xi, yi = int(np.clip(tx, 0, w - 1)), int(np.clip(ty, 0, h - 1))
            rgb[yi, xi] = (255, 64, 64)
    return rgb


def render_event_image(x, y, p, height: int = 180, width: int = 240):
    """Polarity-colored raw event overlay (red = −1, green = +1), the
    rolling-event view of `visualizer.cpp:225-246`."""
    rgb = np.zeros((height, width, 3), np.uint8)
    xi = np.clip(np.round(x).astype(int), 0, width - 1)
    yi = np.clip(np.round(y).astype(int), 0, height - 1)
    pos = p > 0
    rgb[yi[pos], xi[pos], 1] = 255
    rgb[yi[~pos], xi[~pos], 0] = 255
    return rgb


def save_rgb(path: str, rgb: np.ndarray) -> str:
    from PIL import Image

    Image.fromarray(rgb, mode="RGB").save(path)
    return path


def save_patch_views(out_dir: str, tracker, patch_idx: int = 0) -> dict:
    """The per-patch debug views: integrated nabla, predicted nabla, cost
    map (`visualizer.h:20-26`)."""
    import jax.numpy as jnp

    from evo_tpu.tracker import align

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    integrated = np.asarray(align.integrate_events(tracker.table))[patch_idx]
    paths["integrated_nabla"] = save_gray(
        os.path.join(out_dir, "integrated_nabla.png"), integrated
    )
    predicted = np.asarray(align.predicted_nabla(tracker.table, tracker.grads))[patch_idx]
    paths["predicted_nabla"] = save_gray(
        os.path.join(out_dir, "predicted_nabla.png"), predicted
    )
    cm = np.asarray(align.cost_map(tracker.table, tracker.grads, patch_idx))
    paths["cost_map"] = save_gray(os.path.join(out_dir, "cost_map.png"), cm)
    return paths


def plot_trajectories(out_path: str, vo, show_gt: bool = True) -> str | None:
    """2D top-down trajectory plot: estimated keyframe centers vs the
    Sim3-aligned ground truth (the 3D-scene replacement)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None

    poses = [kf.pose for kf in vo.stored_frames] + [
        vo.active_frames[t].pose for t in sorted(vo.active_frames)
    ]
    if not poses:
        return None
    est = np.stack([p[4:7] for p in poses])
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(est[:, 0], est[:, 2], "o-", label="estimated", ms=3)
    if show_gt and vo.gt_aligned:
        gt = np.stack([g[4:7] for g in vo.gt_aligned])
        ax.plot(gt[:, 0], gt[:, 2], "x--", label="GT (Sim3-aligned)", ms=3)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.legend()
    ax.set_aspect("equal")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path
