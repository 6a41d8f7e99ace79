#!/usr/bin/env python3
"""Warp round 3: gather-row economics + patch-replicated operands.

Round-2 finding: everything except flat jnp.take is far slower (lax.gather
with multi-element slices serializes). The flat take costs ~6.7 ms per
491k-row gather at L2/batch32 — so the lever is FEWER gather rows, not a
different gather op.

Probes:
  P1  single take, 491k rows x C width        (baseline slope)
  P4  all 4 taps in ONE take (1.97M rows)     (fusion/pipelining?)
  P6  take with contiguous indices            (non-gather overhead)
  W-dup2: y-pair operand [.., 2C], 2 takes    (halves row count)
  W-quad: 2x2-patch operand [.., 4C], 1 take  (quarters row count)
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
    rs = np.random.RandomState(0)

    # ---- probes at L2 sizes ----
    b, h, w, c = batch, 96, 160, 32
    n = b * h * w
    idx = jnp.asarray(rs.randint(0, n - 1, size=(n,)).astype(np.int32))

    for width in (32, 64, 128):
        op = jnp.asarray(rs.rand(n, width).astype(np.float32)).astype(jnp.bfloat16)
        f = jax.jit(lambda o, i: jnp.take(o, i, axis=0))
        t = timeit(f, (op, idx))
        gbs = n * width * 2 / t / 1e9
        print(f"P1 take {n//1000}k rows x{width:4d}ch bf16: {t*1e3:7.2f} ms ({gbs:5.1f} GB/s)")

    op32 = jnp.asarray(rs.rand(n, 32).astype(np.float32)).astype(jnp.bfloat16)
    idx4 = jnp.concatenate([idx, idx, idx, idx])
    f = jax.jit(lambda o, i: jnp.take(o, i, axis=0))
    t = timeit(f, (op32, idx4))
    print(f"P4 one take of 4n rows x32       : {t*1e3:7.2f} ms")

    cont = jnp.arange(n, dtype=jnp.int32)
    t = timeit(f, (op32, cont))
    print(f"P6 take contiguous idx n x32     : {t*1e3:7.2f} ms")

    # ---- full warp variants ----
    def warp_dup2(image, flow):
        b, h, w, c = image.shape
        iy, ix, ay, ax = _coords(image, flow)
        # rowpair operand: channel block 1 = next row's pixel (edge row dup'd)
        nxt = jnp.concatenate([image[:, 1:], image[:, -1:]], axis=1)
        dup = jnp.concatenate([image, nxt], axis=3)          # [B,H,W,2C]
        flat = dup.reshape(b * h * w, 2 * c)
        boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
        lin = boff + iy * w + ix

        def g(off):
            return jnp.take(flat, (lin + off).reshape(-1), axis=0).reshape(b, h, w, 2 * c)

        left = g(0)    # (y0,x0) | (y1,x0)
        right = g(1)   # (y0,x1) | (y1,x1)
        top = left[..., :c] + ax * (right[..., :c] - left[..., :c])
        bot = left[..., c:] + ax * (right[..., c:] - left[..., c:])
        return top + ay * (bot - top)

    def warp_quad(image, flow):
        b, h, w, c = image.shape
        iy, ix, ay, ax = _coords(image, flow)
        right = jnp.concatenate([image[:, :, 1:], image[:, :, -1:]], axis=2)
        row0 = jnp.concatenate([image, right], axis=3)       # x0|x1 at y
        quad = jnp.concatenate(
            [row0, jnp.concatenate([row0[:, 1:], row0[:, -1:]], axis=1)], axis=3
        )                                                    # [B,H,W,4C]
        flat = quad.reshape(b * h * w, 4 * c)
        boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
        lin = (boff + iy * w + ix).reshape(-1)
        taps = jnp.take(flat, lin, axis=0).reshape(b, h, w, 4 * c)
        tl, tr = taps[..., :c], taps[..., c : 2 * c]
        bl, br = taps[..., 2 * c : 3 * c], taps[..., 3 * c :]
        top = tl + ax * (tr - tl)
        bot = bl + ax * (br - bl)
        return top + ay * (bot - top)

    for lvl, cc in [(2, 32), (3, 64)]:
        hh, ww = 384 // 2**lvl, 640 // 2**lvl
        img = jnp.asarray(rs.rand(batch, hh, ww, cc).astype(np.float32)).astype(jnp.bfloat16)
        uv = jnp.asarray((rs.rand(batch, hh, ww, 2) * 3).astype(np.float32)).astype(jnp.bfloat16)
        ref = np.asarray(jax.jit(dense_image_warp)(img, uv), np.float32)
        for name, fn in [
            ("A flat take (cur)", dense_image_warp),
            ("dup2 2-take", warp_dup2),
            ("quad 1-take", warp_quad),
        ]:
            f = jax.jit(fn)
            out = np.asarray(f(img, uv), np.float32)
            err = np.abs(out - ref).max()
            t = timeit(f, (img, uv))
            print(f"L{lvl} {name:18s}: {t*1e3:7.2f} ms  maxdiff={err:.5f}")


if __name__ == "__main__":
    main()
