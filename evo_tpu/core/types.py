"""Core data types: events, timestamps, windows.

TPU-native redesign of the reference's core types
(`common/include/common/data_types.h:10-45`): instead of
`std::deque<Sample<Event>>` (AoS, unbounded, host-resident) we use
struct-of-arrays batches with static capacity and validity masks, which are
the only shapes XLA can compile efficiently.

Conventions
-----------
- Timestamps are int64 **microseconds** on the host (matching the
  reference's `timestamp_t = std::chrono::microseconds`); on device,
  per-window math uses float32 **seconds relative to the window start**
  so that f32 precision is never a problem (a 300 ms window spans < 2^19 µs).
- Polarity is stored as int8 in {-1, +1} (reference maps {0,1} -> {-1,+1},
  `tools/dataset_reader/src/davis240c_reader.cpp:85-88`).
- A batch of N events is 4 parallel arrays (t, x, y, p) plus a scalar
  `count`; entries at index >= count are padding and must be masked.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Microseconds per second — all host timestamps are int64 µs.
US_PER_S = 1_000_000

# DAVIS240C sensor geometry (reference: feature_detector.h:17 uses 240x180).
DAVIS_WIDTH = 240
DAVIS_HEIGHT = 180


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EventBatch:
    """Fixed-capacity struct-of-arrays batch of DVS events.

    Replaces the reference's `EventSequence = std::deque<Sample<Event>>`
    (`common/include/common/data_types.h:40-45`). Arrays all share leading
    shape [capacity]; `count` gives the number of valid events. Events are
    sorted by `t` ascending (the reference replayer guarantees timestamp
    order; our window batcher preserves it).

    t : float32 seconds relative to `t0_us` (device-friendly).
    x, y : float32 pixel coordinates (float so warps stay fused; original
        sensor coords are exact integers).
    p : float32 polarity in {-1.0, +1.0}.
    """

    t: jax.Array  # [N] f32 seconds since t0_us
    x: jax.Array  # [N] f32
    y: jax.Array  # [N] f32
    p: jax.Array  # [N] f32 (+-1)
    count: jax.Array  # [] int32 number of valid entries
    t0_us: Any = dataclasses.field(
        default=0, metadata=dict(static=False)
    )  # [] int64-like window epoch in µs

    @property
    def capacity(self) -> int:
        return self.t.shape[0]

    def mask(self) -> jax.Array:
        """[N] bool validity mask."""
        idx = jnp.arange(self.capacity, dtype=jnp.int32)
        return idx < self.count

    @staticmethod
    def from_numpy(
        t_us: np.ndarray,
        x: np.ndarray,
        y: np.ndarray,
        p: np.ndarray,
        capacity: int | None = None,
        t0_us: int | None = None,
    ) -> "EventBatch":
        """Pack host arrays (int64 µs timestamps) into a padded device batch."""
        n = len(t_us)
        cap = capacity if capacity is not None else n
        if n > cap:
            raise ValueError(f"{n} events exceed capacity {cap}")
        epoch = int(t_us[0]) if (t0_us is None and n > 0) else int(t0_us or 0)

        def pad(a, dtype):
            out = np.zeros(cap, dtype=dtype)
            out[:n] = a
            return jnp.asarray(out)

        t_rel = (t_us.astype(np.float64) - epoch) / US_PER_S
        return EventBatch(
            t=pad(t_rel, np.float32),
            x=pad(x, np.float32),
            y=pad(y, np.float32),
            p=pad(p, np.float32),
            count=jnp.asarray(n, jnp.int32),
            # kept as a host numpy scalar: device int64 would truncate to
            # int32 with x64 disabled (epochs exceed 2^31 µs after ~36 min)
            t0_us=np.int64(epoch),
        )


@dataclasses.dataclass(frozen=True)
class CalibParams:
    """Static (host-side) camera calibration, the 9 scalars of the
    reference's `calib.txt` (`davis240c_reader.cpp:18-58`)."""

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = DAVIS_WIDTH
    height: int = DAVIS_HEIGHT

    def to_array(self, dtype=jnp.float32) -> jax.Array:
        return jnp.array(
            [self.fx, self.fy, self.cx, self.cy, self.k1, self.k2, self.p1, self.p2, self.k3],
            dtype=dtype,
        )


@dataclasses.dataclass
class ImageSample:
    """A timestamped grayscale frame (host-side; reference `Sample<cv::Mat>`)."""

    t_us: int
    image: np.ndarray  # [H, W] float32 in [0, 1] or uint8


@dataclasses.dataclass
class PoseSample:
    """A timestamped ground-truth pose (host-side; reference `Sample<Pose3d>`)."""

    t_us: int
    pose: np.ndarray  # [7] (qw, qx, qy, qz, tx, ty, tz) — see core.lie
