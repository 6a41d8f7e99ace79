#!/usr/bin/env python3
"""Training-step throughput on TPU: full two-player alternation cycle.

Times one 1:3 recover/generator cycle (4 sub-steps) of the jitted train
steps at the reference configuration, including on-device augmentation.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from unsupervised_detection_tpu.config import Config
    from unsupervised_detection_tpu.train import AdversarialLearner
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    cfg = Config(batch_size=batch, compute_dtype=dtype, train_crop=0.6)
    learner = AdversarialLearner(cfg)
    state = learner.init_state(jax.random.PRNGKey(0))

    rs = np.random.RandomState(0)
    img1 = jnp.asarray(rs.rand(batch, cfg.reader_height, cfg.reader_width, 3)
                       .astype(np.float32) - 0.5)
    img2 = jnp.asarray(rs.rand(batch, cfg.reader_height, cfg.reader_width, 3)
                       .astype(np.float32) - 0.5)
    img1, img2 = learner.shard((img1, img2))

    def cycle(state):
        for sub in range(1, 5):
            state, losses, _ = learner.select_step(sub)(state, img1, img2)
        return state, losses

    state, losses = cycle(state)  # compile both steps
    float(losses["generator"])    # sync

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = cycle(state)
    float(losses["generator"])
    dt = (time.perf_counter() - t0) / iters
    print(
        "train cycle (1 rec + 3 gen, batch %d, %s): %.1f ms -> %.1f samples/s, "
        "%.2f cycles/s" % (batch, dtype, dt * 1e3, 4 * batch / dt, 1 / dt)
    )
    # reference anchor: 40 epochs x 313 steps x 4 sub-steps
    total_cycles = 40 * 313
    print("full reference schedule estimate: %.1f minutes" % (total_cycles * dt / 60))

    # FLOP accounting from the compiled programs themselves: one cycle is
    # 1 recover + 3 generator sub-steps (MFU vs the 127.3 TFLOP/s chained-
    # matmul ceiling measured on this chip and vs v5e bf16 peak).
    try:
        costs = {}
        for name, fn in (("rec", learner.recover_step),
                         ("gen", learner.generator_step)):
            c = fn.lower(state, img1, img2).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            costs[name] = float(c["flops"])
        cycle_flops = (cfg.iters_rec * costs["rec"]
                       + cfg.iters_gen * costs["gen"])
        tflops = cycle_flops / dt / 1e12
        print("cycle FLOPs: %.2f T (rec %.2f + 3 x gen %.2f) -> "
              "%.1f TFLOP/s; MFU %.3f vs 127.3 TFLOP/s measured ceiling, "
              "%.3f vs 197 TFLOP/s v5e bf16 peak"
              % (cycle_flops / 1e12, costs["rec"] / 1e12, costs["gen"] / 1e12,
                 tflops, tflops / 127.3, tflops / 197.0))
    except Exception as e:  # cost_analysis availability varies by backend
        print("FLOP accounting unavailable: %r" % (e,))


if __name__ == "__main__":
    main()
