"""Device mesh construction for the event pipeline.

The reference has no distribution at all (SURVEY.md §2.3); this module
provides the TPU-native communication backend it lacks: a
`jax.sharding.Mesh` with two logical axes —

- ``"space"``: spatial tiles of the sensor plane (context parallelism over
  the 240x180 pixel grid / the 12x9 contrast-max tile grid);
- ``"batch"``: event sub-streams / patch batches / temporal windows (data
  parallelism over features and windows).

Collectives ride ICI inside a slice: `psum` for objective gradients and BA
normal-equation blocks, `ppermute` for boundary-tile halo exchange.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPACE_AXIS = "space"
BATCH_AXIS = "batch"


def make_mesh(n_space: int | None = None, n_batch: int | None = None,
              devices=None) -> Mesh:
    """Build a (space, batch) mesh over the available devices.

    Defaults: all devices on the batch axis (the common single-slice case);
    pass `n_space` to carve spatial tiling out of the device set.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_space is None and n_batch is None:
        n_space, n_batch = 1, n
    elif n_space is None:
        n_space = n // n_batch
    elif n_batch is None:
        n_batch = n // n_space
    if n_space * n_batch != n:
        raise ValueError(f"{n_space}x{n_batch} mesh cannot cover {n} devices")
    return Mesh(devices.reshape(n_space, n_batch), (SPACE_AXIS, BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = BATCH_AXIS
    return NamedSharding(mesh, P(*spec))


def space_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))
