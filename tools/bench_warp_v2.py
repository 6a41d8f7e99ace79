#!/usr/bin/env python3
"""Warp gather formulations, round 2 (batch-32 PWC shapes).

The round-1 winner (flat linear jnp.take, 4 gathers of C-wide rows) costs
26.8 ms at L2/batch32 — the single most expensive op in the PWC forward.
These variants reduce gather count / widen the gathered slices:

  A: current dense_image_warp (4x flat take)
  A2: same but mode=promise_in_bounds (indices provably in range)
  D: 2 lax.gather of (2,C) row pairs (x taps contiguous) on [N,C]
  F: 1 lax.gather of (2,2C) from [B*H,W*C] (all 4 taps, one gather)
  G: 2 lax.gather of (2C,) contiguous slices from flat 1-D operand
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
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _coords(image, flow):
    import jax
    import jax.numpy as jnp

    b, h, w, c = image.shape
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    qy = gy[None] - flow[..., 0].astype(jnp.float32)
    qx = gx[None] - flow[..., 1].astype(jnp.float32)
    fy = jnp.clip(jnp.floor(qy), 0, h - 2)
    fx = jnp.clip(jnp.floor(qx), 0, w - 2)
    ay = jnp.clip(qy - fy, 0, 1).astype(image.dtype)[..., None]
    ax = jnp.clip(qx - fx, 0, 1).astype(image.dtype)[..., None]
    return fy.astype(jnp.int32), fx.astype(jnp.int32), ay, ax


def main():
    import jax
    import jax.numpy as jnp

    from unsupervised_detection_tpu.ops.warp import dense_image_warp
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    def variant_a2(image, flow):
        b, h, w, c = image.shape
        iy, ix, ay, ax = _coords(image, flow)
        boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
        flat = image.reshape(b * h * w, c)
        lin = boff + iy * w + ix

        def g(off):
            return jnp.take(
                flat, (lin + off).reshape(-1), axis=0,
                unique_indices=False, indices_are_sorted=False,
                mode="promise_in_bounds",
            ).reshape(b, h, w, c)

        tl, tr, bl, br = g(0), g(1), g(w), g(w + 1)
        top = tl + ax * (tr - tl)
        bot = bl + ax * (br - bl)
        return top + ay * (bot - top)

    def variant_d(image, flow):
        b, h, w, c = image.shape
        iy, ix, ay, ax = _coords(image, flow)
        boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
        flat = image.reshape(b * h * w, c)
        lin = (boff + iy * w + ix).reshape(-1, 1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
        )

        def g(starts):
            return jax.lax.gather(
                flat, starts, dn, slice_sizes=(2, c),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            ).reshape(b, h, w, 2, c)

        top2 = g(lin)          # (..., 2, c): x0, x0+1 rows at y0
        bot2 = g(lin + w)
        top = top2[..., 0, :] + ax * (top2[..., 1, :] - top2[..., 0, :])
        bot = bot2[..., 0, :] + ax * (bot2[..., 1, :] - bot2[..., 0, :])
        return top + ay * (bot - top)

    def variant_f(image, flow):
        b, h, w, c = image.shape
        iy, ix, ay, ax = _coords(image, flow)
        rows = (jnp.arange(b, dtype=jnp.int32) * h)[:, None, None] + iy
        cols = ix * c
        starts = jnp.stack([rows.reshape(-1), cols.reshape(-1)], axis=-1)
        op = image.reshape(b * h, w * c)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
        )
        blocks = jax.lax.gather(
            op, starts, dn, slice_sizes=(2, 2 * c),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(b, h, w, 2, 2, c)
        top = blocks[..., 0, 0, :] + ax * (blocks[..., 0, 1, :] - blocks[..., 0, 0, :])
        bot = blocks[..., 1, 0, :] + ax * (blocks[..., 1, 1, :] - blocks[..., 1, 0, :])
        return top + ay * (bot - top)

    def variant_g(image, flow):
        b, h, w, c = image.shape
        iy, ix, ay, ax = _coords(image, flow)
        boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
        lin = ((boff + iy * w + ix) * c).reshape(-1, 1)
        op = image.reshape(-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
        )

        def g(starts):
            return jax.lax.gather(
                op, starts, dn, slice_sizes=(2 * c,),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            ).reshape(b, h, w, 2, c)

        top2 = g(lin)
        bot2 = g(lin + w * c)
        top = top2[..., 0, :] + ax * (top2[..., 1, :] - top2[..., 0, :])
        bot = bot2[..., 0, :] + ax * (bot2[..., 1, :] - bot2[..., 0, :])
        return top + ay * (bot - top)

    rs = np.random.RandomState(0)
    for lvl, c in [(2, 32), (3, 64)]:
        h, w = 384 // 2**lvl, 640 // 2**lvl
        img = jnp.asarray(rs.rand(batch, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
        uv = jnp.asarray((rs.rand(batch, h, w, 2) * 3).astype(np.float32)).astype(jnp.bfloat16)
        ref = np.asarray(jax.jit(dense_image_warp)(img, uv), np.float32)
        for name, fn in [
            ("A flat take (cur)", dense_image_warp),
            ("A2 take in-bounds", variant_a2),
            ("D rowpair gather", variant_d),
            ("F one 2x2C gather", variant_f),
            ("G flat 2C slices", variant_g),
        ]:
            f = jax.jit(fn)
            try:
                out = np.asarray(f(img, uv), np.float32)
                err = np.abs(out - ref).max()
                t = timeit(f, (img, uv))
                print(f"L{lvl} {name:18s}: {t*1e3:7.2f} ms  maxdiff={err:.5f}")
            except Exception as e:
                print(f"L{lvl} {name:18s}: FAILED {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
