#!/usr/bin/env python3
"""Two batch-64 PWC suspects from the round-2 trace (tools/bench_trace_full.py:
flow=160 ms: fusion 114, compare_select 23.8, copy 6.2).

A. LeakyReLU as jnp.where(select) vs jnp.maximum(x, 0.1x) — identical math
   (alpha<1), different TPU lowering; compare_select_fusion was 23.8 ms.
B. N-padding of skinny-output convs: the flow heads contract K=565*9 into
   N=2 output channels; if the MXU pads N to the 128-lane tile, an N=2 conv
   costs the same as N=128 — ~19 ms of pure padding waste at L2 sizes.
   Microbench N in {2, 8, 32, 128} at the real shapes, plus an NCHW variant
   (M=channels in sublanes) that dodges the lane padding if XLA honors it.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
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


def main():
    import jax
    import jax.numpy as jnp
    from unsupervised_detection_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    B, H, W, C = 64, 96, 160, 565
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)

    # --- B: N sweep ---------------------------------------------------------
    for n in (2, 8, 32, 128):
        k = jnp.asarray(rs.rand(3, 3, C, n).astype(np.float32)).astype(jnp.bfloat16)
        f = jax.jit(lambda a, kk: jax.lax.conv_general_dilated(
            a, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
        t = timeit(f, x, k)
        print(f"conv NHWC K={C}x9 N={n:3d}: {t*1e3:7.2f} ms")

    # NCHW formulation for N=2 (channels into sublanes/M)
    k2 = jnp.asarray(rs.rand(3, 3, C, 2).astype(np.float32)).astype(jnp.bfloat16)

    def nchw(a, kk):
        an = a.transpose(0, 3, 1, 2)
        kn = kk.transpose(3, 2, 0, 1)  # OIHW
        y = jax.lax.conv_general_dilated(
            an, kn, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y.transpose(0, 2, 3, 1)

    print(f"conv NCHW K={C}x9 N=  2: {timeit(jax.jit(nchw), x, k2)*1e3:7.2f} ms "
          "(incl. operand transposes)")

    # dot_general over taps: y[m, n] = sum_k xpatch[m, k] w[k, n] with the
    # 9 taps as 9 separate [BHW, C] x [C, 2] matmuls accumulated — K=C per
    # matmul, N=2; avoids materializing patches.
    def taps_dot(a, kk):
        pad = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = None
        for dy in range(3):
            for dx in range(3):
                s = jax.lax.slice(pad, (0, dy, dx, 0), (B, dy + H, dx + W, C))
                t = jnp.einsum("bhwc,cn->bhwn", s, kk[dy, dx])
                y = t if y is None else y + t
        return y

    print(f"tapdot     K={C}   N=  2: {timeit(jax.jit(taps_dot), x, k2)*1e3:7.2f} ms")

    # --- A: leaky lowering on a big tensor ----------------------------------
    big = jnp.asarray(rs.rand(B, 81, H, W).astype(np.float32)).astype(jnp.bfloat16)
    f_where = jax.jit(lambda a: jnp.where(a >= 0, a, 0.1 * a) + 1.0)
    f_max = jax.jit(lambda a: jnp.maximum(a, 0.1 * a) + 1.0)
    print(f"leaky where [B,81,H,W]: {timeit(f_where, big)*1e3:7.2f} ms")
    print(f"leaky max   [B,81,H,W]: {timeit(f_max, big)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
