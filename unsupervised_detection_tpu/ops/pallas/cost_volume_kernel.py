"""Fused Pallas TPU kernel for the PWC cost volume.

The XLA formulation (ops/cost_volume.py) materializes 81 shifted slices of
the padded feature map; each slice+multiply+reduce is a separate HBM-fed
elementwise op unless XLA fuses aggressively. This kernel loads each
pyramid-level feature map into VMEM ONCE per batch element, forms all
(2r+1)^2 shifted products from on-chip memory, and writes the finished
(LeakyReLU'd) volume — HBM traffic drops from O(offsets * H*W*C) to
O(H*W*C + H*W*offsets).

PWC pyramid levels at the 640x384 reader resolution are small enough that a
whole level fits in VMEM per batch element (level 2: 96x160x32 ~ 2 MB);
`cost_volume_pallas` falls back to the XLA path when the estimate exceeds
the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _kernel(c1_ref, warp_ref, out_ref, *, r: int, h: int, w: int, c: int):
    c1 = c1_ref[0]
    padded = jnp.pad(warp_ref[0], ((r, r), (r, r), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, dtype=c1.dtype)
    costs = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            shifted = jax.lax.slice(padded, (dy, dx, 0), (dy + h, dx + w, c))
            costs.append(jnp.sum(c1 * shifted, axis=-1) * inv_c)
    vol = jnp.stack(costs, axis=-1)
    out_ref[0] = jax.nn.leaky_relu(vol, negative_slope=0.1)


def _vmem_estimate(h: int, w: int, c: int, r: int, itemsize: int) -> int:
    n_off = (2 * r + 1) ** 2
    padded = (h + 2 * r) * (w + 2 * r) * c
    return itemsize * (2 * h * w * c + padded + 2 * h * w * n_off)


@functools.partial(jax.jit, static_argnums=(2,))
def cost_volume_pallas(c1, warp, search_range: int = 4):
    """Fused cost volume; same semantics as ops.cost_volume.cost_volume."""
    b, h, w, c = c1.shape
    r = search_range
    n_off = (2 * r + 1) ** 2
    if _vmem_estimate(h, w, c, r, c1.dtype.itemsize) > VMEM_BUDGET_BYTES:
        from ..cost_volume import _cost_volume_xla

        return _cost_volume_xla(c1, warp, r)

    kernel = functools.partial(_kernel, r=r, h=h, w=w, c=c)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, n_off), c1.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, n_off), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * n_off,
            bytes_accessed=c1.dtype.itemsize * b * (2 * h * w * c + h * w * n_off),
            transcendentals=0,
        ),
    )(c1, warp)
