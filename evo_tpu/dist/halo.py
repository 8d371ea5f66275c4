"""Halo exchange for spatially sharded fields.

When the sensor plane (or the contrast-max tile grid) is sharded across
devices, two couplings cross shard boundaries (SURVEY.md §2.3 item 2):

- Gaussian splat stamps (radius 3 px, `contrast_functor.h:66-87`): events
  within 3 px of a shard edge contribute to the neighbor's pixels;
- TV regularization between adjacent tiles (`feature_detector.cpp:369-396`):
  each boundary tile needs its neighbor's velocity.

Both reduce to exchanging a fixed-width boundary strip with the left/right
mesh neighbors, implemented with `jax.lax.ppermute` inside `shard_map`.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from evo_tpu.dist.mesh import SPACE_AXIS


def exchange_halo(local, axis_name: str = SPACE_AXIS, width: int = 1, axis: int = 1):
    """Inside shard_map: return (left_halo, right_halo) strips received from
    the neighbors of this device along `axis_name`.

    local: this shard's block; strips of size `width` along `axis` are sent
    to both neighbors (non-periodic: edge devices receive zeros).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    def take(arr, lo, hi):
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(lo, hi)
        return arr[tuple(sl)]

    size = local.shape[axis]
    right_edge = take(local, size - width, size)  # goes to right neighbor
    left_edge = take(local, 0, width)  # goes to left neighbor

    # receive from left: left neighbor's right edge (shift right)
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    # receive from right: right neighbor's left edge (shift left)
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    # edge devices get zeros from ppermute's missing sources already
    del idx
    return from_left, from_right


def splat_with_halo_reduction(local_img, axis_name: str = SPACE_AXIS,
                              halo_width: int = 3, axis: int = 1):
    """Fold a locally over-splatted image's halo margins into the neighbor
    shards: `local_img` includes `halo_width` extra columns on each side
    (events near the boundary splatted into the margin); the margins are
    ppermute'd to the neighbors and added onto their edges, returning the
    exact [..., W_local] interior. This makes N-device splat bitwise-close
    to the 1-device result (SURVEY.md §7 hard part 5)."""
    size = local_img.shape[axis]

    def take(arr, lo, hi):
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(lo, hi)
        return arr[tuple(sl)]

    n = jax.lax.axis_size(axis_name)
    left_margin = take(local_img, 0, halo_width)
    right_margin = take(local_img, size - halo_width, size)
    interior = take(local_img, halo_width, size - halo_width)

    # my right margin belongs to my right neighbor's left edge, and vice versa
    from_left = jax.lax.ppermute(
        right_margin, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        left_margin, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    wi = interior.shape[axis]
    pad_left = jnp.concatenate(
        [from_left, jnp.zeros_like(take(interior, halo_width, wi))], axis=axis
    )
    pad_right = jnp.concatenate(
        [jnp.zeros_like(take(interior, 0, wi - halo_width)), from_right], axis=axis
    )
    return interior + pad_left + pad_right
