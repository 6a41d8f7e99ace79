#!/usr/bin/env python3
"""Cost-volume formulations, round 2.

The round-1 XLA costvol stacks 81 per-shift maps on the CHANNEL axis; each
[B,H,W,1] stack input gets lane-padded 128x by the TPU layout (seen in the
batch-64 OOM dump: 238 MB per slice for 1.9 MB of data). Variants here stack
on a major axis and transpose once at the end.

  X: current (stack axis=3)
  M: stack axis=1 -> [B,81,H,W] -> transpose to [B,H,W,81]
  M2: like M but leaky_relu applied pre-transpose
  E: dy-major: 9 row-shifted einsums producing [B,H,W,9] each, concat
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


def main():
    import jax
    import jax.numpy as jnp

    from unsupervised_detection_tpu.ops.cost_volume import _cost_volume_xla
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    r = 4

    def variant_m(c1, warp):
        b, h, w, c = c1.shape
        padded = jnp.pad(warp, ((0, 0), (r, r), (r, r), (0, 0)))
        inv_c = jnp.asarray(1.0 / c, dtype=c1.dtype)
        costs = []
        for dy in range(2 * r + 1):
            for dx in range(2 * r + 1):
                shifted = jax.lax.slice(padded, (0, dy, dx, 0), (b, dy + h, dx + w, c))
                costs.append(jnp.sum(c1 * shifted, axis=3))
        vol = jnp.stack(costs, axis=1)                      # [B, 81, H, W]
        vol = vol.transpose(0, 2, 3, 1) * inv_c             # [B, H, W, 81]
        return jax.nn.leaky_relu(vol, negative_slope=0.1)

    def variant_m2(c1, warp):
        b, h, w, c = c1.shape
        padded = jnp.pad(warp, ((0, 0), (r, r), (r, r), (0, 0)))
        inv_c = jnp.asarray(1.0 / c, dtype=c1.dtype)
        costs = []
        for dy in range(2 * r + 1):
            for dx in range(2 * r + 1):
                shifted = jax.lax.slice(padded, (0, dy, dx, 0), (b, dy + h, dx + w, c))
                costs.append(jnp.sum(c1 * shifted, axis=3))
        vol = jax.nn.leaky_relu(jnp.stack(costs, axis=1) * inv_c, negative_slope=0.1)
        return vol.transpose(0, 2, 3, 1)

    def variant_e(c1, warp):
        b, h, w, c = c1.shape
        padded = jnp.pad(warp, ((0, 0), (r, r), (r, r), (0, 0)))
        inv_c = jnp.asarray(1.0 / c, dtype=c1.dtype)
        rows = []
        for dy in range(2 * r + 1):
            row = jax.lax.slice(padded, (0, dy, 0, 0), (b, dy + h, 2 * r + w, c))
            # [B,H,W,9]: for each dx shift, channel dot with c1
            shifts = jnp.stack(
                [jax.lax.slice(row, (0, 0, dx, 0), (b, h, dx + w, c)) for dx in range(2 * r + 1)],
                axis=3,
            )  # [B,H,W,9,C]
            rows.append(jnp.einsum("bhwc,bhwkc->bhwk", c1, shifts))
        vol = jnp.concatenate(rows, axis=3) * inv_c
        return jax.nn.leaky_relu(vol, negative_slope=0.1)

    rs = np.random.RandomState(0)
    for lvl, c in [(2, 32), (3, 64)]:
        h, w = 384 // 2**lvl, 640 // 2**lvl
        c1 = jnp.asarray(rs.rand(batch, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
        c2 = jnp.asarray(rs.rand(batch, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
        ref = np.asarray(jax.jit(lambda a, b: _cost_volume_xla(a, b, r))(c1, c2), np.float32)
        for name, fn in [
            ("X stack-ch (cur)", lambda a, b: _cost_volume_xla(a, b, r)),
            ("M major+transp", variant_m),
            ("M2 act-pre-transp", variant_m2),
            ("E dy-einsum", variant_e),
        ]:
            f = jax.jit(fn)
            try:
                out = np.asarray(f(c1, c2), np.float32)
                err = np.abs(out - ref).max()
                t = timeit(f, (c1, c2))
                print(f"L{lvl} {name:18s}: {t*1e3:7.2f} ms  maxdiff={err:.5f}")
            except Exception as e:
                print(f"L{lvl} {name:18s}: FAILED {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
