#!/usr/bin/env python3
"""Profile-driven PWC optimization: per-variant traces + HLO inspection.

Trace finding (batch 32/iter): copies 42.6ms + concatenate 31.9ms (costvol
stack of [B,H,W,1] slices and estimator dense concats), warp gathers 21ms
(fusion.12-15), convs ~50ms. This script checks, per candidate, what the
optimized HLO emits and where device time actually goes.
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(tag, fn, args, iters=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    float(jnp.sum(out))
    wall = (time.perf_counter() - t0) / 10

    logdir = f"/tmp/jaxtrace_{tag}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
    tj = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))[-1]
    data = json.load(gzip.open(tj))
    events = data["traceEvents"]
    pids = {e.get("pid"): e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    cat = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and "/device:" in pids.get(e.get("pid"), "")
                and not e.get("name", "").startswith("jit")):
            cat[e["name"].split(".")[0]] += e.get("dur", 0)
    print(f"== {tag}: wall {wall*1e3:.2f} ms; device categories (ms/iter):")
    for name, d in cat.most_common(8):
        print(f"   {d/iters/1000:8.2f}  {name}")
    return wall


def main():
    import jax
    import jax.numpy as jnp

    import unsupervised_detection_tpu.models.pwcnet as pm
    from unsupervised_detection_tpu.models.pwcnet import PWCNet
    from unsupervised_detection_tpu.ops import warp as warp_mod
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = 32
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(batch, 384, 640, 3).astype(np.float32) - 0.5)
    img2 = jnp.asarray(rs.rand(batch, 384, 640, 3).astype(np.float32) - 0.5)
    pwc = PWCNet(dtype=jnp.bfloat16)
    pwc_vars = pwc.init(jax.random.PRNGKey(0), img, img2)
    run = lambda: jax.jit(lambda p, a, b: pwc.apply(p, a, b))

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
        vol = jax.nn.leaky_relu(jnp.stack(costs, axis=1) * inv_c, negative_slope=0.1)
        return vol.transpose(0, 2, 3, 1)

    orig_cv = pm.cost_volume
    orig_warp = pm.dense_image_warp

    # Baseline
    profile("base", run(), (pwc_vars, img, img2))

    # M-variant HLO: does the [.,.,.,1] copy pattern survive?
    pm.cost_volume = cv_m
    f = run()
    txt = f.lower(pwc_vars, img, img2).compile().as_text()
    n_pad1 = txt.count("bf16[32,96,160,1]{")
    n_copy = txt.count(" copy(")
    print(f"[M HLO] '[32,96,160,1]' buffers: {n_pad1}, copies: {n_copy}")
    profile("cvM", f, (pwc_vars, img, img2))
    pm.cost_volume = orig_cv

    # quad warp
    pm.dense_image_warp = warp_mod._warp_quad
    profile("quadwarp", run(), (pwc_vars, img, img2))
    pm.dense_image_warp = orig_warp

    # quad warp + M costvol
    pm.dense_image_warp = warp_mod._warp_quad
    pm.cost_volume = cv_m
    profile("quad+cvM", run(), (pwc_vars, img, img2))
    pm.dense_image_warp = orig_warp
    pm.cost_volume = orig_cv


if __name__ == "__main__":
    main()
