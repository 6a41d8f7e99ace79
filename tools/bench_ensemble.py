#!/usr/bin/env python3
"""4-crop ensemble inference throughput on TPU (the aug_test path).

Times EnsembleEvaluator.infer — four central crops run as one 4B batch
(eval/ensemble.py) — and reports frames/sec where one frame = one input
pair evaluated at all four crops. Usage: python tools/bench_ensemble.py [batch]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from unsupervised_detection_tpu.config import Config
    from unsupervised_detection_tpu.eval.ensemble import EnsembleEvaluator
    from unsupervised_detection_tpu.train.objective import AdversarialObjective
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32  # 4B = 128 on device
    cfg = Config(batch_size=batch, compute_dtype="bfloat16")
    ens = EnsembleEvaluator(cfg)
    obj = AdversarialObjective(cfg)

    rng = jax.random.PRNGKey(0)
    r_gen, r_pwc = jax.random.split(rng)
    img_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 3), jnp.float32)
    flow_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 2), jnp.float32)
    img_r = jnp.zeros((1, cfg.reader_height, cfg.reader_width, 3), jnp.float32)
    gen_vars = obj.generator.init(r_gen, img_w, flow_w)
    pwc_vars = obj.pwc.init(r_pwc, img_r, img_r)

    rs = np.random.RandomState(0)
    img = lambda: jnp.asarray(
        rs.rand(batch, cfg.reader_height, cfg.reader_width, 3).astype(np.float32) - 0.5)
    img1, img2 = img(), img()
    gt = jnp.asarray((rs.rand(batch, cfg.reader_height, cfg.reader_width, 1) > 0.5)
                     .astype(np.float32))
    args = (gen_vars["params"], gen_vars["batch_stats"], pwc_vars["params"],
            img1, img2, gt)

    sync = lambda out: float(jnp.sum(out["pred_masks"][0, 0]))
    sync(ens.infer(*args))  # compile

    iters = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = ens.infer(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)

    fps = batch / best
    print(json.dumps({
        "metric": "davis2016_4crop_ensemble_fps",
        "value": round(fps, 2),
        "unit": "frames/sec/chip (x4 crops each)",
        "batch": batch,
    }))


if __name__ == "__main__":
    main()
