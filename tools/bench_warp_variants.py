#!/usr/bin/env python3
"""Experiment: warp gather formulations on TPU.

A: 4x take_along_axis on flattened rows (current)
B: one lax.gather of (2,2,C) corner blocks per pixel
C: one big jnp.take over (B*H*W) linear indices, 4 taps
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=10):
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from unsupervised_detection_tpu.ops.warp import dense_image_warp
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    batch = 8
    rs = np.random.RandomState(0)

    def variant_b(image, flow):
        b, h, w, c = image.shape
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        qy = gy[None] - flow[..., 0].astype(jnp.float32)
        qx = gx[None] - flow[..., 1].astype(jnp.float32)
        fy = jnp.clip(jnp.floor(qy), 0, h - 2)
        fx = jnp.clip(jnp.floor(qx), 0, w - 2)
        ay = jnp.clip(qy - fy, 0, 1).astype(image.dtype)[..., None]
        ax = jnp.clip(qx - fx, 0, 1).astype(image.dtype)[..., None]
        iy = fy.astype(jnp.int32)
        ix = fx.astype(jnp.int32)
        # one gather of 2x2xC corner blocks
        starts = jnp.stack([iy.reshape(b, -1), ix.reshape(b, -1)], axis=-1)  # (b, hw, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        def per_image(img, st):
            return jax.lax.gather(
                img, st, dn, slice_sizes=(2, 2, c), mode=jax.lax.GatherScatterMode.CLIP
            )
        blocks = jax.vmap(per_image)(image, starts)  # (b, hw, 2, 2, c)
        blocks = blocks.reshape(b, h, w, 2, 2, c)
        top = blocks[..., 0, 0, :] + ax * (blocks[..., 0, 1, :] - blocks[..., 0, 0, :])
        bot = blocks[..., 1, 0, :] + ax * (blocks[..., 1, 1, :] - blocks[..., 1, 0, :])
        return top + ay * (bot - top)

    def variant_c(image, flow):
        b, h, w, c = image.shape
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        qy = gy[None] - flow[..., 0].astype(jnp.float32)
        qx = gx[None] - flow[..., 1].astype(jnp.float32)
        fy = jnp.clip(jnp.floor(qy), 0, h - 2)
        fx = jnp.clip(jnp.floor(qx), 0, w - 2)
        ay = jnp.clip(qy - fy, 0, 1).astype(image.dtype)[..., None]
        ax = jnp.clip(qx - fx, 0, 1).astype(image.dtype)[..., None]
        iy = fy.astype(jnp.int32)
        ix = fx.astype(jnp.int32)
        boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
        flat = image.reshape(b * h * w, c)
        lin = boff + iy * w + ix
        def g(off):
            return jnp.take(flat, (lin + off).reshape(-1), axis=0).reshape(b, h, w, c)
        tl, tr, bl, br = g(0), g(1), g(w), g(w + 1)
        top = tl + ax * (tr - tl)
        bot = bl + ax * (br - bl)
        return top + ay * (bot - top)

    for lvl, c in [(3, 64), (2, 32)]:
        h, w = 384 // 2**lvl, 640 // 2**lvl
        img = jnp.asarray(rs.rand(batch, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
        uv = jnp.asarray((rs.rand(batch, h, w, 2) * 3).astype(np.float32)).astype(jnp.bfloat16)
        ref = np.asarray(jax.jit(dense_image_warp)(img, uv), np.float32)
        for name, fn in [("A take_along", dense_image_warp),
                         ("B block gather", variant_b),
                         ("C flat take", variant_c)]:
            f = jax.jit(fn)
            try:
                out = np.asarray(f(img, uv), np.float32)
                err = np.abs(out - ref).max()
                t = timeit(f, (img, uv))
                print(f"L{lvl} {name:15s}: {t*1e3:7.2f} ms  maxdiff={err:.5f}")
            except Exception as e:
                print(f"L{lvl} {name:15s}: FAILED {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
