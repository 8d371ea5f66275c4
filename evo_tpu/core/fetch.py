"""Single-transfer device→host fetch.

On a remote-attached TPU every synchronous device→host pull pays a full
tunnel round trip (~45-70 ms measured) regardless of size, so pulling the
patch-table mirror as 7 separate `np.asarray` calls costs ~0.5 s per frame
— more than the device compute of the whole window. `fetch` packs an
arbitrary pytree of device arrays into ONE int32 vector on device (bitcast,
no value change for f32/i32; widened for bool/i8/i16) and pulls it with a
single transfer; the host slices and reinterprets.

The packing program is jitted and cached per (treedef, shapes, dtypes)
signature — a handful of signatures exist in the pipeline, so steady state
is one fused device program + one RTT per fetch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_PACKERS: dict = {}


def _pack_leaf(a):
    """Device array -> (i32 1-D array, host-side restore dtype)."""
    d = a.dtype
    if d == jnp.float32:
        return lax.bitcast_convert_type(a, jnp.int32).reshape(-1)
    if d == jnp.int32 or d == jnp.uint32:
        return a.view(jnp.int32).reshape(-1) if d == jnp.uint32 else a.reshape(-1)
    if d == jnp.bool_ or d == jnp.int8 or d == jnp.int16 or d == jnp.uint8:
        return a.astype(jnp.int32).reshape(-1)
    if d == jnp.float64 or d == jnp.int64:
        # split into two i32 words (hi, lo) — exact
        bits = lax.bitcast_convert_type(
            a.astype(jnp.float64) if d == jnp.float64 else a, jnp.int64
        ) if d == jnp.float64 else a
        lo = (bits & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32).view(jnp.int32)
        hi = (bits >> 32).astype(jnp.int32)
        return jnp.stack([hi, lo], axis=-1).reshape(-1)
    raise TypeError(f"fetch: unsupported dtype {d}")


def _restore(seg: np.ndarray, shape, dtype):
    if dtype == np.float32:
        return seg.view(np.float32).reshape(shape)
    if dtype == np.int32:
        return seg.reshape(shape).copy()
    if dtype == np.uint32:
        return seg.view(np.uint32).reshape(shape)
    if dtype == np.bool_:
        return (seg != 0).reshape(shape)
    if dtype in (np.dtype(np.int8), np.dtype(np.int16), np.dtype(np.uint8)):
        return seg.astype(dtype).reshape(shape)
    if dtype in (np.dtype(np.int64), np.dtype(np.float64)):
        pairs = seg.reshape(-1, 2).astype(np.int64)
        bits = (pairs[:, 0] << 32) | (pairs[:, 1] & 0xFFFFFFFF)
        out = bits.view(np.float64) if dtype == np.float64 else bits
        return out.reshape(shape)
    raise TypeError(f"fetch: unsupported dtype {dtype}")


def _n_words(shape, dtype) -> int:
    n = int(np.prod(shape, dtype=np.int64)) if shape else 1
    return 2 * n if dtype in (np.dtype(np.int64), np.dtype(np.float64)) else n


def fetch(tree):
    """Pull a pytree of device arrays to host numpy with ONE transfer."""
    leaves, treedef = jax.tree.flatten(tree)
    sig = (treedef, tuple((tuple(l.shape), np.dtype(l.dtype)) for l in leaves))
    packer = _PACKERS.get(sig)
    if packer is None:
        def pack(ls):
            return jnp.concatenate([_pack_leaf(a) for a in ls])

        packer = jax.jit(pack)
        _PACKERS[sig] = packer
    packed = np.asarray(packer(leaves))  # the single device->host pull
    out = []
    off = 0
    for l in leaves:
        shape, dtype = tuple(l.shape), np.dtype(l.dtype)
        k = _n_words(shape, dtype)
        out.append(_restore(packed[off:off + k], shape, dtype))
        off += k
    return jax.tree.unflatten(treedef, out)


def fetch_async(tree):
    """Start the packed transfer without blocking; returns a handle whose
    `.get()` blocks and unpacks. Lets a window's log pull overlap the next
    window's compute."""
    leaves, treedef = jax.tree.flatten(tree)
    sig = (treedef, tuple((tuple(l.shape), np.dtype(l.dtype)) for l in leaves))
    packer = _PACKERS.get(sig)
    if packer is None:
        def pack(ls):
            return jnp.concatenate([_pack_leaf(a) for a in ls])

        packer = jax.jit(pack)
        _PACKERS[sig] = packer
    dev = packer(leaves)
    try:
        dev.copy_to_host_async()
    except Exception:
        pass

    class _Handle:
        def get(self):
            packed = np.asarray(dev)
            out = []
            off = 0
            for l in leaves:
                shape, dtype = tuple(l.shape), np.dtype(l.dtype)
                k = _n_words(shape, dtype)
                out.append(_restore(packed[off:off + k], shape, dtype))
                off += k
            return jax.tree.unflatten(treedef, out)

    return _Handle()
