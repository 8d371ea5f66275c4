"""DAVIS240C dataset reader.

Host-side ingestion layer; capability counterpart of the reference's
`DatasetReader`/`Davis240cReader` (`tools/dataset_reader/include/dataset_reader/
dataset_reader.h:17-31`, `src/davis240c_reader.cpp`). File formats:

- ``events.txt``      one event per line: ``t_sec x y p`` (p in {0,1})
- ``images.txt``      ``t_sec relative/path.png``
- ``groundtruth.txt`` ``t_sec tx ty tz qx qy qz qw``
- ``calib.txt``       9 scalars ``fx fy cx cy k1 k2 p1 p2 k3``
- ``trajectory.txt``  precomputed tracks ``track_id t_sec x y`` (the
  reference's evaluator artifact, `evaluator.cpp:125-150`, re-ingestable for
  VO-only runs, `davis240c_reader.cpp:279-299`)

The event hot path uses the native C++ mmap parser
(`evo_tpu/native/event_parser.cpp`) with a numpy fallback; timestamps become
int64 µs (rounded like the reference's `t * 1e6 + 0.5`). Chunked reading via
`get_events(start, max_count)` mirrors the reference's resumable 1M-event
cursor (`davis240c_reader.cpp:183-212`) but the whole stream is parsed once
and kept as host numpy arrays — 1 GB of events is ~13 bytes/event, fine on a
TPU host.
"""

from __future__ import annotations

import ctypes
import dataclasses
import logging
import os
import time

import numpy as np

from evo_tpu import native
from evo_tpu.core.types import CalibParams

_log = logging.getLogger(__name__)

EVENT_CHUNK = 1_000_000  # default chunk size, matching davis240c_reader.cpp:14


@dataclasses.dataclass
class EventArrays:
    """Host struct-of-arrays event stream (sorted by t ascending)."""

    t_us: np.ndarray  # [N] int64
    x: np.ndarray  # [N] int16
    y: np.ndarray  # [N] int16
    p: np.ndarray  # [N] int8 in {-1, +1}

    def __len__(self) -> int:
        return len(self.t_us)

    def slice(self, lo: int, hi: int) -> "EventArrays":
        return EventArrays(self.t_us[lo:hi], self.x[lo:hi], self.y[lo:hi], self.p[lo:hi])


def _empty_events() -> EventArrays:
    return EventArrays(
        np.zeros(0, np.int64), np.zeros(0, np.int16),
        np.zeros(0, np.int16), np.zeros(0, np.int8),
    )


def _parse_events_native(path: str) -> EventArrays | None:
    lib = native.load()
    if lib is None:
        return None
    if os.path.getsize(path) == 0:  # mmap rejects empty files
        return _empty_events()
    n = lib.evo_count_events(path.encode(), 0)
    if n < 0:
        raise FileNotFoundError(path)
    t_us = np.empty(n, np.int64)
    x = np.empty(n, np.int16)
    y = np.empty(n, np.int16)
    p = np.empty(n, np.int8)
    got = lib.evo_parse_events(
        path.encode(),
        t_us.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        n,
        0,
    )
    if got < 0:
        return None
    return EventArrays(t_us[:got], x[:got], y[:got], p[:got])


def _parse_events_numpy(path: str) -> EventArrays:
    data = np.loadtxt(path, dtype=np.float64, ndmin=2)
    if data.size == 0:
        return _empty_events()
    t_us = (data[:, 0] * 1e6 + 0.5).astype(np.int64)
    x = data[:, 1].astype(np.int16)
    y = data[:, 2].astype(np.int16)
    p = np.where(data[:, 3] > 0, 1, -1).astype(np.int8)
    return EventArrays(t_us, x, y, p)


def parse_events(path: str) -> EventArrays:
    """Parse events.txt with the native parser, falling back to numpy."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    t0 = time.perf_counter()
    ev = _parse_events_native(path)
    how = "native"
    if ev is None:
        ev = _parse_events_numpy(path)
        how = "numpy"
    dt = time.perf_counter() - t0
    if len(ev) > 0 and dt > 0:
        _log.info(
            "parsed %d events in %.3fs (%s, %.1f Mev/s)",
            len(ev), dt, how, len(ev) / dt / 1e6,
        )
    return ev


def parse_images(path: str, load_pixels: bool = True):
    """Parse images.txt → (t_us int64 [N], list of image paths or arrays).

    Counterpart of `davis240c_reader.cpp:94-108` (`cv::imread` grayscale).
    Images are loaded as float32 in [0, 1].
    """
    base = os.path.dirname(path)
    ts, entries = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            t_str, rel = line.split(maxsplit=1)
            ts.append(int(float(t_str) * 1e6 + 0.5))
            entries.append(os.path.join(base, rel))
    t_us = np.asarray(ts, np.int64)
    if not load_pixels:
        return t_us, entries
    return t_us, [load_image(p) for p in entries]


def load_image_u8(path: str) -> np.ndarray:
    """Load a grayscale image as raw uint8 [H, W] (PIL; ingestion only)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.uint8)


def load_image(path: str) -> np.ndarray:
    """Load a grayscale image as float32 [H, W] in [0, 1] (PIL; ingestion only)."""
    return load_image_u8(path).astype(np.float32) / 255.0


def parse_groundtruth(path: str):
    """Parse groundtruth.txt → (t_us [N] int64, poses [N, 7] float64).

    File rows are ``t tx ty tz qx qy qz qw`` (`davis240c_reader.cpp:110-151`);
    we re-order into our SE3 layout (qw, qx, qy, qz, tx, ty, tz).
    """
    data = np.loadtxt(path, dtype=np.float64, ndmin=2)
    if data.size == 0:
        return np.zeros(0, np.int64), np.zeros((0, 7))
    t_us = (data[:, 0] * 1e6 + 0.5).astype(np.int64)
    t = data[:, 1:4]
    qxyz = data[:, 4:7]
    qw = data[:, 7:8]
    q = np.concatenate([qw, qxyz], axis=1)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    poses = np.concatenate([q, t], axis=1)
    return t_us, poses


def parse_calib(path: str, width: int = 240, height: int = 180) -> CalibParams:
    """Parse the 9-scalar calib.txt (`davis240c_reader.cpp:18-58`)."""
    vals = np.loadtxt(path, dtype=np.float64).ravel()
    if vals.size < 4:
        raise ValueError(f"calib file {path} has {vals.size} values, need >= 4")
    v = np.zeros(9)
    v[: min(9, vals.size)] = vals[:9]
    return CalibParams(
        fx=v[0], fy=v[1], cx=v[2], cy=v[3],
        k1=v[4], k2=v[5], p1=v[6], p2=v[7], k3=v[8],
        width=width, height=height,
    )


def parse_trajectory(path: str):
    """Parse trajectory.txt → dict track_id -> (t_us [M] int64, xy [M, 2] f64).

    Counterpart of `Davis240cReader::getTrajectory` (`davis240c_reader.cpp:279-299`).
    """
    data = np.loadtxt(path, dtype=np.float64, ndmin=2)
    tracks: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    if data.size == 0:
        return tracks
    ids = data[:, 0].astype(np.int64)
    t_us = (data[:, 1] * 1e6 + 0.5).astype(np.int64)
    xy = data[:, 2:4]
    for tid in np.unique(ids):
        sel = ids == tid
        order = np.argsort(t_us[sel], kind="stable")
        tracks[int(tid)] = (t_us[sel][order], xy[sel][order])
    return tracks


class Davis240cDataset:
    """A DAVIS240C dataset directory (events.txt / images.txt / groundtruth.txt
    / calib.txt [/ trajectory.txt]) — the reader facade the rest of the
    framework consumes. Everything is parsed eagerly except image pixels,
    which load lazily per frame."""

    def __init__(self, root: str, load_pixels_eagerly: bool = False):
        self.root = root
        self.events = parse_events(os.path.join(root, "events.txt"))
        img_file = os.path.join(root, "images.txt")
        if os.path.exists(img_file):
            self.image_t_us, self._image_paths = parse_images(img_file, load_pixels=False)
        else:
            self.image_t_us, self._image_paths = np.zeros(0, np.int64), []
        self._image_cache: dict[int, np.ndarray] = {}
        gt_file = os.path.join(root, "groundtruth.txt")
        if os.path.exists(gt_file):
            self.gt_t_us, self.gt_poses = parse_groundtruth(gt_file)
        else:
            self.gt_t_us, self.gt_poses = np.zeros(0, np.int64), np.zeros((0, 7))
        calib_file = os.path.join(root, "calib.txt")
        self.calib = parse_calib(calib_file) if os.path.exists(calib_file) else None
        traj_file = os.path.join(root, "trajectory.txt")
        self.trajectory = parse_trajectory(traj_file) if os.path.exists(traj_file) else None
        if load_pixels_eagerly:
            for i in range(len(self._image_paths)):
                self.image(i)

    @property
    def num_images(self) -> int:
        return len(self._image_paths)

    def image_u8(self, idx: int) -> np.ndarray:
        """Raw uint8 frame — the wire format for device upload (4x fewer
        bytes through a remote-TPU tunnel than f32; the tracker normalizes
        to [0, 1] on device with the same k/255 f32 arithmetic)."""
        if idx not in self._image_cache:
            self._image_cache[idx] = load_image_u8(self._image_paths[idx])
        return self._image_cache[idx]

    def image(self, idx: int) -> np.ndarray:
        return self.image_u8(idx).astype(np.float32) / 255.0

    def get_events(self, start: int = 0, max_count: int = EVENT_CHUNK) -> EventArrays:
        """Chunked event access (the reference's resumable cursor semantics)."""
        return self.events.slice(start, start + max_count)
