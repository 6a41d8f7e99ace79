#!/usr/bin/env python3
"""Minimal repro: Mosaic rejects dynamic tiled-dim DMA offsets (JAX 0.9.0).

Context (VERDICT r3 item 5): the gather-free windowed warp kernel
(ops/pallas/warp_kernel.py) DMAs a K-row window of a (B, W, H*C) image at a
runtime offset start*C derived from the flow. Mosaic cannot lower gathers at
all, and this repro pins the second wall: a `memref_slice` whose offset along
a TILED dim (lane tiling 128, sublane tiling 8) is a runtime scalar fails
verification with

    Mosaic failed to compile TPU kernel: Failed to prove that a tile index
    in dimension 2 is divisible by the tiling (128).

even when the offset is aligned BY CONSTRUCTION (here: offset = s * 256 with
s prefetched, so every runtime value is 128-divisible — the proof engine
does not track multiples through scalar arithmetic).

Run on TPU: python tools/repro_mosaic_dynamic_dma.py
  -> prints the Mosaic error for the lane-dim case (and the sublane-dim
     variant), confirming the limitation. On CPU (interpret), both pass,
     which is why the CPU test suite cannot catch this.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build(axis: int):
    """pallas_call copying a 128x256 tile out of a 128x1024 VMEM buffer at a
    dynamic, provably-aligned offset along `axis` (0=sublane, 1=lane)."""

    def kernel(offs_ref, src_ref, out_ref, win_ref, sem):
        o = offs_ref[0] * (8 if axis == 0 else 256)  # aligned by construction
        src = (src_ref.at[pl.ds(o, 128), :] if axis == 0
               else src_ref.at[:, pl.ds(o, 256)])
        dma = pltpu.make_async_copy(src, win_ref, sem)
        dma.start()
        dma.wait()
        out_ref[...] = win_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((128, 256), lambda i, s: (0, 0)),
        scratch_shapes=[pltpu.VMEM((128, 256), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    shape = (1024, 256) if axis == 0 else (128, 1024)

    @jax.jit
    def run(offs, src):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
        )(offs, src)

    return run, shape


def main():
    rng = np.random.RandomState(0)
    print("platform:", jax.devices()[0].platform, flush=True)
    for axis, name in ((1, "lane (tiling 128)"), (0, "sublane (tiling 8)")):
        run, shape = build(axis)
        src = jnp.asarray(rng.rand(*shape), jnp.float32)
        offs = jnp.asarray([2], jnp.int32)
        try:
            out = np.asarray(run(offs, src))
            start = 2 * (8 if axis == 0 else 256)
            want = (src[start:start + 128, :] if axis == 0
                    else src[:, start:start + 256])
            ok = np.array_equal(out, np.asarray(want))
            print(f"dynamic {name} DMA offset: COMPILED, correct={ok}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - repro prints any failure
            msg = str(e).split("\n")
            pin = next((l for l in msg if "Failed to prove" in l
                        or "Mosaic" in l), msg[0])
            print(f"dynamic {name} DMA offset: REJECTED -> {pin.strip()}",
                  flush=True)


if __name__ == "__main__":
    sys.exit(main())
