#!/usr/bin/env python3
"""Cost volume: XLA vs Pallas kernel, correctness + speed on TPU."""

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

    from unsupervised_detection_tpu.ops.cost_volume import cost_volume
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = 8
    rs = np.random.RandomState(0)
    chans = {6: 196, 5: 128, 4: 96, 3: 64, 2: 32}
    for lvl in (4, 3, 2):
        h, w = 384 // 2**lvl, 640 // 2**lvl
        c = chans[lvl]
        c1 = jnp.asarray(rs.rand(batch, h, w, c).astype(np.float32) - 0.5).astype(jnp.bfloat16)
        c2 = jnp.asarray(rs.rand(batch, h, w, c).astype(np.float32) - 0.5).astype(jnp.bfloat16)
        f_xla = jax.jit(lambda a, b: cost_volume(a, b, 4))
        f_pl = jax.jit(lambda a, b: cost_volume(a, b, 4, use_pallas=True))
        ref = np.asarray(f_xla(c1, c2), np.float32)
        t_xla = timeit(f_xla, (c1, c2))
        print(f"L{lvl} xla    : {t_xla*1e3:7.2f} ms  ({h}x{w}x{c})", flush=True)
        try:
            out = np.asarray(f_pl(c1, c2), np.float32)
            err = np.abs(out - ref).max()
            t_pl = timeit(f_pl, (c1, c2))
            print(f"L{lvl} pallas : {t_pl*1e3:7.2f} ms  maxdiff={err:.5f}", flush=True)
        except Exception as e:
            print(f"L{lvl} pallas : FAILED {type(e).__name__} {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
