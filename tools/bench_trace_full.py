#!/usr/bin/env python3
"""Device-time breakdown of the CURRENT bench pipeline (flow+resize+mask).

Traces the exact forward bench.py times and buckets device time by op
category, plus flow-only and generator-only timings so the budget can be
attributed. Usage: python tools/bench_trace_full.py [batch].
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


def trace_categories(tag, fn, args, iters=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    sync = lambda o: float(jnp.sum(o[0]) if isinstance(o, tuple) else jnp.sum(o))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / 10)

    logdir = f"/tmp/jaxtrace_{tag}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = fn(*args)
        sync(out)
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
    print(f"== {tag}: wall {best*1e3:.2f} ms; device categories (ms/iter):")
    for name, d in cat.most_common(10):
        print(f"   {d/iters/1000:8.2f}  {name}")
    return best


def main():
    import jax
    import jax.numpy as jnp

    from unsupervised_detection_tpu.config import Config
    from unsupervised_detection_tpu.train.objective import AdversarialObjective
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = Config(batch_size=batch, compute_dtype="bfloat16")
    obj = AdversarialObjective(cfg)

    rng = jax.random.PRNGKey(0)
    r_gen, r_pwc = jax.random.split(rng)
    img_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 3), jnp.float32)
    flow_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 2), jnp.float32)
    img_r = jnp.zeros((1, cfg.reader_height, cfg.reader_width, 3), jnp.float32)
    gen_vars = obj.generator.init(r_gen, img_w, flow_w)
    pwc_vars = obj.pwc.init(r_pwc, img_r, img_r)

    rs = np.random.RandomState(0)
    img1 = jnp.asarray(rs.rand(batch, cfg.reader_height, cfg.reader_width, 3)
                       .astype(np.float32) - 0.5)
    img2 = jnp.asarray(rs.rand(batch, cfg.reader_height, cfg.reader_width, 3)
                       .astype(np.float32) - 0.5)

    @jax.jit
    def full(gp, gs, pp, a, b):
        flow = obj.compute_flow(pp, a, b)
        image, flow_n = obj.resize_to_working(a, flow)
        mask = obj.generate_mask(gp, gs, image, flow_n)
        return mask, jnp.sum(mask)

    @jax.jit
    def flow_only(pp, a, b):
        return obj.compute_flow(pp, a, b)

    @jax.jit
    def gen_only(gp, gs, a, flow):
        image, flow_n = obj.resize_to_working(a, flow)
        return obj.generate_mask(gp, gs, image, flow_n)

    gp, gs, pp = gen_vars["params"], gen_vars["batch_stats"], pwc_vars["params"]
    t_full = trace_categories("full", full, (gp, gs, pp, img1, img2))
    t_flow = trace_categories("flow", flow_only, (pp, img1, img2))
    qflow = flow_only(pp, img1, img2)
    t_gen = trace_categories("gen", gen_only, (gp, gs, img1, qflow))
    print(f"full {t_full*1e3:.2f} = flow {t_flow*1e3:.2f} + gen/resize "
          f"{t_gen*1e3:.2f} (+ fusion slack {1e3*(t_full-t_flow-t_gen):.2f}) ms; "
          f"{batch/t_full:.1f} fps")


if __name__ == "__main__":
    main()
