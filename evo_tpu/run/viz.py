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


def _np_quat_to_mat(q: np.ndarray) -> np.ndarray:
    """Host-side [w,x,y,z] quaternion → rotation matrix (no jax import)."""
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _frustum_segments(pose: np.ndarray, scale: float = 0.15):
    """Camera-frustum wireframe segments for a T_w_c pose [qw qx qy qz tx ty tz]
    — the GL pyramid of `renderCamera` (`scene_helper.h:8-39`): center to the
    four image corners plus the far rectangle."""
    R = _np_quat_to_mat(np.asarray(pose[:4], np.float64))
    c = np.asarray(pose[4:7], np.float64)
    # image-corner rays in camera frame (square pyramid, z forward)
    corners = np.array([
        [-1, -1, 2.0], [1, -1, 2.0], [1, 1, 2.0], [-1, 1, 2.0]
    ]) * scale
    pts = (R @ corners.T).T + c
    segs = [(c, p) for p in pts]
    segs += [(pts[i], pts[(i + 1) % 4]) for i in range(4)]
    return segs


def render_scene_3d(out_path: str, vo, max_stored: int = 60) -> str | None:
    """3D scene view to PNG — the offline counterpart of the reference's
    interactive scene (`drawScene`, `visualizer.cpp:253-315`): active keyframe
    frusta (green), stored keyframe frusta (gray), Sim3-aligned ground-truth
    trail (red), live landmarks (blue) and archived landmarks (light gray)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from mpl_toolkits.mplot3d.art3d import Line3DCollection
    except ImportError:
        return None

    active = [vo.active_frames[t].pose for t in sorted(vo.active_frames)]
    stored = [kf.pose for kf in vo.stored_frames[-max_stored:]]
    if not active and not stored:
        return None
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")

    def add_frusta(poses, color, lw):
        segs = [s for p in poses for s in _frustum_segments(np.asarray(p))]
        if segs:
            ax.add_collection3d(
                Line3DCollection(segs, colors=color, linewidths=lw)
            )

    add_frusta(stored, "0.6", 0.6)
    add_frusta(active, "tab:green", 1.0)
    if vo.map.landmarks:
        lm = np.stack(list(vo.map.landmarks.values()))
        ax.scatter(lm[:, 0], lm[:, 1], lm[:, 2], s=4, c="tab:blue",
                   label=f"landmarks ({len(lm)})")
    if getattr(vo, "stored_landmarks", None):
        sl = np.stack([p for _, p in vo.stored_landmarks])
        ax.scatter(sl[:, 0], sl[:, 1], sl[:, 2], s=2, c="0.75",
                   label=f"archived ({len(sl)})")
    if vo.gt_aligned:
        gt = np.stack([np.asarray(g[4:7]) for g in vo.gt_aligned])
        ax.plot(gt[:, 0], gt[:, 1], gt[:, 2], "r--", lw=1,
                label="GT (Sim3-aligned)")
    # equal aspect around the data
    allp = [np.asarray(p[4:7]) for p in active + stored]
    pts = np.stack(allp) if allp else np.zeros((1, 3))
    ctr, rad = pts.mean(0), max(float(np.ptp(pts, 0).max()) / 2, 0.5)
    ax.set_xlim(ctr[0] - rad, ctr[0] + rad)
    ax.set_ylim(ctr[1] - rad, ctr[1] + rad)
    ax.set_zlim(ctr[2] - rad, ctr[2] + rad)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    ax.legend(loc="upper right", fontsize=8)
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out_path


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
