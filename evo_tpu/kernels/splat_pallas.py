"""Pallas TPU splat kernel.

A hand-written Mosaic kernel for the event-decode accumulate: the grid walks
fixed-size event chunks; each step builds the separable tap matrices in VMEM
(broadcasted-iota + VPU elementwise) and accumulates `Yᵀ @ X` into a
VMEM-resident output block on the MXU. Functionally identical to
`kernels.splat.splat_image` (bilinear mode); exists as the explicitly
scheduled path — the accumulator provably never leaves VMEM between chunks,
and chunk loads are pipelined by the Pallas grid machinery.

Use `splat_image_pallas(..., interpret=True)` on CPU (tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _taps(d, mode: str, sigma: float, radius: int):
    if mode == "nearest":
        return (jnp.abs(d) <= 0.5).astype(jnp.float32)
    if mode == "bilinear":
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))
    if mode == "gaussian":
        w = jnp.exp(-0.5 * (d / sigma) ** 2)
        return jnp.where(jnp.abs(d) <= radius, w, 0.0)
    raise ValueError(mode)


def _make_kernel(mode: str, sigma: float, radius: int):
    def _kernel(x_ref, y_ref, w_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        x = x_ref[:]  # [E]
        y = y_ref[:]
        w = w_ref[:]
        e = x.shape[0]
        h, wd = out_ref.shape
        # iota must be integer-typed on TPU; cast afterwards
        gy = jax.lax.broadcasted_iota(jnp.int32, (e, h), 1).astype(jnp.float32)
        gx = jax.lax.broadcasted_iota(jnp.int32, (e, wd), 1).astype(jnp.float32)
        ytap = _taps(gy - y[:, None], mode, sigma, radius) * w[:, None]
        xtap = _taps(gx - x[:, None], mode, sigma, radius)
        out_ref[:] += jax.lax.dot_general(
            ytap, xtap,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return _kernel


@partial(
    jax.jit,
    static_argnames=("height", "width", "chunk", "interpret", "mode",
                     "sigma", "radius"),
)
def splat_image_pallas(
    x,
    y,
    weight,
    height: int = 180,
    width: int = 240,
    *,
    chunk: int = 1024,
    interpret: bool = False,
    mode: str = "bilinear",
    sigma: float = 1.0,
    radius: int = 3,
):
    """Separable event splat via the Pallas kernel. x, y, weight: [N]
    (N padded to a multiple of `chunk` with weight=0). mode covers the same
    stamps as kernels.splat.splat_image — 'gaussian' (σ, radius as in
    contrast_functor.h:66-99) is what compensation uses."""
    n = x.shape[0]
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros(pad, x.dtype)])
        y = jnp.concatenate([y, jnp.zeros(pad, y.dtype)])
        weight = jnp.concatenate([weight, jnp.zeros(pad, weight.dtype)])
    n_chunks = (n + pad) // chunk

    return pl.pallas_call(
        _make_kernel(mode, sigma, radius),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (height, width), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), y.astype(jnp.float32), weight.astype(jnp.float32))
