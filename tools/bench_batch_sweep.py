#!/usr/bin/env python3
"""Batch sweep of the parity inference program: fps + compiled-memory stats.

Explains the batch-size fps curve (233/343/516/400 at 32/64/128/192 in
round 2) with evidence from the compiled programs themselves: XLA's
memory_analysis() (argument/output/temp/code bytes — temp growth beyond
linear indicates HBM-pressure-driven scheduling or spilling) and
cost_analysis() FLOPs, alongside measured fps.

Usage: python tools/bench_batch_sweep.py [batch ...] (default 64 96 128 160 192 256)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch):
    import jax
    import jax.numpy as jnp

    from unsupervised_detection_tpu.config import Config
    from unsupervised_detection_tpu.train.objective import AdversarialObjective

    cfg = Config(batch_size=batch, compute_dtype="bfloat16")
    obj = AdversarialObjective(cfg)

    rng = jax.random.PRNGKey(0)
    r_gen, r_pwc = jax.random.split(rng)
    img_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 3), jnp.float32)
    flow_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 2), jnp.float32)
    img_r = jnp.zeros((1, cfg.reader_height, cfg.reader_width, 3), jnp.float32)
    gen_vars = jax.jit(obj.generator.init)(r_gen, img_w, flow_w)
    pwc_vars = jax.jit(obj.pwc.init)(r_pwc, img_r, img_r)

    def forward(gen_params, gen_stats, pwc_params, img1, img2):
        flow = obj.compute_flow(pwc_params, img1, img2)
        image, flow_n = obj.resize_to_working(img1, flow)
        mask = obj.generate_mask(gen_params, gen_stats, image, flow_n)
        return mask, jnp.sum(mask)

    rs = np.random.RandomState(0)
    shape = (batch, cfg.reader_height, cfg.reader_width, 3)
    img1 = jnp.asarray(rs.rand(*shape).astype(np.float32) - 0.5)
    img2 = jnp.asarray(rs.rand(*shape).astype(np.float32) - 0.5)
    args = (gen_vars["params"], gen_vars["batch_stats"], pwc_vars["params"],
            img1, img2)

    compiled = jax.jit(forward).lower(*args).compile()
    rec = {"batch": batch}
    try:
        mem = compiled.memory_analysis()
        rec.update({
            "temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
            "args_mb": round(mem.argument_size_in_bytes / 2**20, 1),
            "out_mb": round(mem.output_size_in_bytes / 2**20, 1),
            "code_mb": round(mem.generated_code_size_in_bytes / 2**20, 1),
        })
    except Exception as e:
        rec["memory_analysis_error"] = f"{type(e).__name__}: {e}"
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        rec["gflop_per_frame"] = round(float(cost["flops"]) / batch / 1e9, 2)
    except Exception:
        pass

    float(compiled(*args)[1])  # warm up; scalar fetch = tunnel-safe sync
    iters = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        checksum = None
        for _ in range(iters):
            checksum = compiled(*args)[1]
        float(checksum)
        best = min(best, (time.perf_counter() - t0) / iters)
    rec["fps"] = round(batch / best, 1)
    rec["ms_per_batch"] = round(best * 1e3, 2)
    return rec


def main():
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batches = [int(a) for a in sys.argv[1:]] or [64, 96, 128, 160, 192, 256]
    for b in batches:
        print(json.dumps(measure(b)), flush=True)


if __name__ == "__main__":
    main()
