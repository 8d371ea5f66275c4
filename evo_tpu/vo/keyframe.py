"""Keyframes, matches, and the landmark map.

Host-side counterparts of the reference's `Keyframe`, `Match` and
`MapLandmarks` (`implementation/visual_odometry/include/visual_odometry/
keyframe.h:12-41`, `src/keyframe.cpp`). These are small, data-dependent
containers driving policy; the numeric work (RANSAC, triangulation, BA) runs
in batched device solvers that consume padded arrays packed from them.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Keyframe:
    """A snapshot of live patch centers + a pose estimate
    (`keyframe.h:24-41`; constructed from live tracker patches,
    `keyframe.cpp:5-14`)."""

    t_us: int
    landmarks: dict[int, np.ndarray]  # track_id -> [2] pixel position
    pose: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0, 0, 0, 0, 0, 0])
    )  # SE3 [7] T_w_c

    def shared_tracks(self, other: "Keyframe") -> list[int]:
        """Sorted intersection of track ids (`Keyframe::getSharedTracks`,
        keyframe.cpp:16-31)."""
        return sorted(set(self.landmarks) & set(other.landmarks))


@dataclasses.dataclass
class Match:
    """RANSAC/localization result (`keyframe.h:12-16`)."""

    pose: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0, 0, 0, 0, 0, 0])
    )  # T_w_c (or relative transform during bootstrap)
    inliers: list[int] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class MapLandmarks:
    """3D landmarks + per-track observation lists (`keyframe.h:18-22`)."""

    landmarks: dict[int, np.ndarray] = dataclasses.field(default_factory=dict)
    observations: dict[int, list[int]] = dataclasses.field(default_factory=dict)
