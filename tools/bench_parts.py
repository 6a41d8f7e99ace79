#!/usr/bin/env python3
"""Component-level TPU timing: where does the inference budget go?

Times the feature pyramid, full PWC, generator, cost volume (XLA vs Pallas)
and warp in isolation. Sync is via scalar fetch (block_until_ready is
unreliable through the remote-TPU tunnel).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=10):
    import jax.numpy as jnp

    out = fn(*args)
    s = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from unsupervised_detection_tpu.config import Config
    from unsupervised_detection_tpu.models import GeneratorNet, PWCNet
    from unsupervised_detection_tpu.models.pwcnet import FeaturePyramid
    from unsupervised_detection_tpu.ops.cost_volume import cost_volume
    from unsupervised_detection_tpu.ops.warp import dense_image_warp
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dtype = jnp.bfloat16 if (len(sys.argv) < 3 or sys.argv[2] == "bfloat16") else jnp.float32
    cfg = Config(batch_size=batch)
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)

    img_r = jnp.asarray(rs.rand(batch, 384, 640, 3).astype(np.float32) - 0.5)
    img_w = jnp.asarray(rs.rand(batch, 192, 384, 3).astype(np.float32) - 0.5)
    flow_w = jnp.asarray(rs.rand(batch, 192, 384, 2).astype(np.float32))

    # feature pyramid
    fp = FeaturePyramid(dtype=dtype)
    fp_vars = fp.init(rng, img_r)
    f = jax.jit(lambda p, x: fp.apply(p, x)[-1])
    t = timeit(f, (fp_vars, img_r))
    print(f"featpyr x1        : {t*1e3:8.2f} ms  ({batch/t:7.0f} img/s)")

    # full PWC
    pwc = PWCNet(dtype=dtype)
    pwc_vars = pwc.init(rng, img_r, img_r)
    f = jax.jit(lambda p, a, b: pwc.apply(p, a, b))
    t = timeit(f, (pwc_vars, img_r, img_r))
    print(f"PWC full          : {t*1e3:8.2f} ms  ({batch/t:7.0f} pair/s)")

    # generator
    gen = GeneratorNet(dtype=dtype)
    gen_vars = gen.init(rng, img_w, flow_w)
    f = jax.jit(lambda p, a, b: gen.apply(p, a, b))
    t = timeit(f, (gen_vars, img_w, flow_w))
    print(f"generator         : {t*1e3:8.2f} ms  ({batch/t:7.0f} img/s)")

    # cost volume + warp at each PWC level
    chans = {6: 196, 5: 128, 4: 96, 3: 64, 2: 32}
    for lvl in (2, 3):
        h, w = 384 // 2**lvl, 640 // 2**lvl
        c = chans[lvl]
        c1 = jnp.asarray(rs.rand(batch, h, w, c).astype(np.float32)).astype(dtype)
        c2 = jnp.asarray(rs.rand(batch, h, w, c).astype(np.float32)).astype(dtype)
        uv = jnp.asarray(rs.rand(batch, h, w, 2).astype(np.float32) * 3).astype(dtype)
        f = jax.jit(lambda a, b: cost_volume(a, b, 4))
        t = timeit(f, (c1, c2))
        print(f"costvol xla  L{lvl}   : {t*1e3:8.2f} ms   ({h}x{w}x{c})")
        f = jax.jit(lambda a, b: cost_volume(a, b, 4, use_pallas=True))
        try:
            t = timeit(f, (c1, c2))
            print(f"costvol plls L{lvl}   : {t*1e3:8.2f} ms")
        except Exception as e:
            print(f"costvol plls L{lvl}   : FAILED {type(e).__name__}: {e}")
        f = jax.jit(dense_image_warp)
        t = timeit(f, (c2, uv))
        print(f"warp         L{lvl}   : {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
