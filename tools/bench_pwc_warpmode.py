#!/usr/bin/env python3
"""Time the FULL PWC forward under each warp formulation (in-context numbers;
the isolated-op wins of bench_warp_v3 did not translate to the full bench)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from unsupervised_detection_tpu.models import PWCNet
    from unsupervised_detection_tpu.ops import warp as warp_mod
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

    modes = {
        "flat-all": lambda c: warp_mod._warp_flat,
        "quad<=32/dup2<=64": None,  # current dispatch
        "dup2-all": lambda c: warp_mod._warp_dup2,
        "quad-all": lambda c: warp_mod._warp_quad,
    }
    orig = warp_mod.dense_image_warp
    for name, pick in modes.items():
        if pick is None:
            warp_mod.dense_image_warp = orig
        else:
            def make(p):
                def w(image, flow):
                    return p(image.shape[-1])(image, flow)
                return w
            warp_mod.dense_image_warp = make(pick)
        # re-bind inside the model module (it imported the symbol)
        import unsupervised_detection_tpu.models.pwcnet as pm
        pm.dense_image_warp = warp_mod.dense_image_warp
        f = jax.jit(lambda p, a, b: pwc.apply(p, a, b))
        t = timeit(f)
        print(f"PWC full [{name:18s}]: {t*1e3:8.2f} ms ({batch/t:6.0f} pair/s)")
    warp_mod.dense_image_warp = orig


if __name__ == "__main__":
    main()
