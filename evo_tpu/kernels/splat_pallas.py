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
    ytap = jnp.maximum(0.0, 1.0 - jnp.abs(gy - y[:, None])) * w[:, None]
    xtap = jnp.maximum(0.0, 1.0 - jnp.abs(gx - x[:, None]))
    out_ref[:] += jax.lax.dot_general(
        ytap, xtap,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(
    jax.jit,
    static_argnames=("height", "width", "chunk", "interpret"),
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
):
    """Bilinear event splat via the Pallas kernel. x, y, weight: [N]
    (N padded to a multiple of `chunk` with weight=0)."""
    n = x.shape[0]
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.zeros(pad, x.dtype)])
        y = jnp.concatenate([y, jnp.zeros(pad, y.dtype)])
        weight = jnp.concatenate([weight, jnp.zeros(pad, weight.dtype)])
    n_chunks = (n + pad) // chunk

    return pl.pallas_call(
        _kernel,
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
