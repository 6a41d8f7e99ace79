"""Fused Pallas TPU kernel for the PWC cost volume.

The XLA formulation (ops/cost_volume.py) materializes 81 shifted slices of
the padded feature map, re-reading it from HBM per offset. This kernel keeps
one padded feature map per batch element in VMEM and forms all (2r+1)^2
shifted products on-chip: HBM traffic drops from O(offsets * H*W*C) to
O(H*W*C + H*W*offsets).

Layout: channels-first (C, H, W) so W sits in the lane dimension and the
per-offset shifted windows are cheap 2-D slices; the channel reduction is a
loop over the leading (untiled) axis with f32 accumulation. Inputs are
transposed outside the kernel (a fused XLA transpose), output is produced
as (n_offsets, H, W) per batch element and transposed back.

PWC pyramid levels at the 640x384 reader resolution are small enough that a
whole padded level fits in VMEM per batch element (level 2:
32 x 104 x 168 bf16 ~ 1.1 MB); `cost_volume_pallas` falls back to the XLA
path when the estimate exceeds the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _kernel(c1_ref, pad_ref, out_ref, *, r: int, h: int, w: int, c: int):
    # c1_ref: (1, c, h, w); pad_ref: (1, c, h+2r, w+2r); out: (1, n_off, h, w)
    inv_c = jnp.float32(1.0 / c)
    n = 2 * r + 1
    for dy in range(n):
        for dx in range(n):
            # channel reduction as a fori_loop: keeps the Mosaic IR linear
            # in offsets rather than offsets * channels
            def body(ch, acc):
                shifted = pad_ref[0, ch, dy : dy + h, dx : dx + w]
                return acc + (c1_ref[0, ch] * shifted).astype(jnp.float32)

            acc = jax.lax.fori_loop(0, c, body, jnp.zeros((h, w), jnp.float32))
            vol = jax.nn.leaky_relu(acc * inv_c, negative_slope=0.1)
            out_ref[0, dy * n + dx] = vol.astype(out_ref.dtype)


def _vmem_estimate(h: int, w: int, c: int, r: int, itemsize: int) -> int:
    n_off = (2 * r + 1) ** 2
    padded = (h + 2 * r) * (w + 2 * r) * c
    return itemsize * (h * w * c + padded + h * w * n_off)


@functools.partial(jax.jit, static_argnums=(2, 3))
def cost_volume_pallas(c1, warp, search_range: int = 4,
                       interpret: bool = False):
    """Fused cost volume; same semantics as ops.cost_volume.cost_volume.

    interpret=True runs the kernel through the Pallas interpreter (any
    backend) — the CPU-testable path tests/test_pallas_costvol.py uses."""
    b, h, w, c = c1.shape
    r = search_range
    n_off = (2 * r + 1) ** 2
    if _vmem_estimate(h, w, c, r, c1.dtype.itemsize) > VMEM_BUDGET_BYTES:
        from ..cost_volume import _cost_volume_xla

        return _cost_volume_xla(c1, warp, r)

    c1_t = jnp.transpose(c1, (0, 3, 1, 2))
    warp_t = jnp.transpose(warp, (0, 3, 1, 2))
    padded = jnp.pad(warp_t, ((0, 0), (0, 0), (r, r), (r, r)))

    kernel = functools.partial(_kernel, r=r, h=h, w=w, c=c)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_off, h, w), c1.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h + 2 * r, w + 2 * r), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_off, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * n_off,
            bytes_accessed=c1.dtype.itemsize * b * (2 * h * w * c + h * w * n_off),
            transcendentals=0,
        ),
        interpret=interpret,
    )(c1_t, padded)
    return jnp.transpose(out, (0, 2, 3, 1))
