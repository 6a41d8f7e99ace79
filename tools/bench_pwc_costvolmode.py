#!/usr/bin/env python3
"""Full-PWC timing under different cost-volume formulations (in-context).

Ablation (bench_pwc_ablate.py) attributes ~61 ms of the 150 ms PWC forward
to the cost volumes at batch 32 — far more than the ~13 ms the isolated op
bench suggests. The batch-64 OOM dump shows why: the channel-axis stack of
81 [B,H,W,1] slices acquires 128x lane padding through remat copies.

  X  : current (stack axis=3)
  M  : per-shift maps stacked on axis=1 -> one [B,81,H,W]->[B,H,W,81] transpose
  M2 : like M, LeakyReLU before the transpose
  P  : round-1 Pallas kernel
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import unsupervised_detection_tpu.models.pwcnet as pm
    from unsupervised_detection_tpu.models.pwcnet import PWCNet
    from unsupervised_detection_tpu.ops.cost_volume import _cost_volume_xla
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(batch, 384, 640, 3).astype(np.float32) - 0.5)
    img2 = jnp.asarray(rs.rand(batch, 384, 640, 3).astype(np.float32) - 0.5)

    pwc = PWCNet(dtype=jnp.bfloat16)
    pwc_vars = pwc.init(jax.random.PRNGKey(0), img, img2)

    def timeit(f, iters=10):
        out = f(pwc_vars, img, img2)
        float(jnp.sum(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(pwc_vars, img, img2)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    def cv_m(c1, warp, search_range=4, use_pallas=False):
        r = search_range
        b, h, w, c = c1.shape
        padded = jnp.pad(warp, ((0, 0), (r, r), (r, r), (0, 0)))
        inv_c = jnp.asarray(1.0 / c, dtype=c1.dtype)
        costs = []
        for dy in range(2 * r + 1):
            for dx in range(2 * r + 1):
                s = jax.lax.slice(padded, (0, dy, dx, 0), (b, dy + h, dx + w, c))
                costs.append(jnp.sum(c1 * s, axis=3))
        vol = jnp.stack(costs, axis=1).transpose(0, 2, 3, 1) * inv_c
        return jax.nn.leaky_relu(vol, negative_slope=0.1)

    def cv_m2(c1, warp, search_range=4, use_pallas=False):
        r = search_range
        b, h, w, c = c1.shape
        padded = jnp.pad(warp, ((0, 0), (r, r), (r, r), (0, 0)))
        inv_c = jnp.asarray(1.0 / c, dtype=c1.dtype)
        costs = []
        for dy in range(2 * r + 1):
            for dx in range(2 * r + 1):
                s = jax.lax.slice(padded, (0, dy, dx, 0), (b, dy + h, dx + w, c))
                costs.append(jnp.sum(c1 * s, axis=3))
        vol = jax.nn.leaky_relu(jnp.stack(costs, axis=1) * inv_c, negative_slope=0.1)
        return vol.transpose(0, 2, 3, 1)

    def cv_pallas(c1, warp, search_range=4, use_pallas=False):
        from unsupervised_detection_tpu.ops.pallas.cost_volume_kernel import (
            cost_volume_pallas,
        )
        return cost_volume_pallas(c1, warp, search_range)

    orig = pm.cost_volume
    for name, fn in [("X stack-ch (cur)", orig), ("M major+transp", cv_m),
                     ("M2 act-pre-transp", cv_m2), ("P pallas", cv_pallas)]:
        pm.cost_volume = fn
        f = jax.jit(lambda p, a, b: pwc.apply(p, a, b))
        try:
            t = timeit(f)
            print(f"PWC full [{name:18s}]: {t*1e3:8.2f} ms ({batch/t:6.0f} pair/s)")
        except Exception as e:
            print(f"PWC full [{name:18s}]: FAILED {type(e).__name__} {str(e)[:100]}")
    pm.cost_volume = orig


if __name__ == "__main__":
    main()
