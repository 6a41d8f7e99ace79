#!/usr/bin/env python3
"""Conv-class roofline for the MFU defense (companion to bench_matmul_ceiling).

bench_matmul_ceiling.py establishes the chip's matmul ceiling (127.3 TFLOP/s
chained bf16 4096, 2026-08-19 run — ~2x the 68 TFLOP/s round-3 assumption).
But this model's FLOPs are ~all 3x3 convolutions at 16..196 channels, and a
convolution's achievable rate on the MXU depends on how XLA tiles
(spatial x batch) x (kernel x C_in) x C_out — it does NOT reach the big-matmul
rate at PWC-like channel counts. This sweep measures the conv-class ceiling
across the shapes the flow/mask nets actually run plus scaled-up controls, so
bench.py's MFU can be read against three defended numbers:

  paper peak (197) > measured matmul ceiling (~127) > conv-class ceiling
  (this sweep) >= model-achieved (bench.py).

FLOP accounting matches bench.py's XLA cost-analysis convention
(2 * B*H*W * K*K * Cin * Cout per conv; multiply-add = 2).
Usage: python tools/bench_conv_ceiling.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters=10):
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out))  # tunnel sync (block_until_ready no-ops)
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

    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform,
          getattr(jax.devices()[0], "device_kind", "?"), flush=True)
    rng = np.random.RandomState(0)

    @jax.jit
    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    # (label, B, H, W, Cin, Cout) — model shapes first, controls after.
    cases = [
        # PWC feature pyramid / estimator shapes at the bench batch (128):
        ("pwc_L2_est 128x96x160 128->128", 128, 96, 160, 128, 128),
        ("pwc_L2_feat 128x96x160 32->32", 128, 96, 160, 32, 32),
        ("pwc_L4_est 128x24x40 128->128", 128, 24, 40, 128, 128),
        ("pwc_ctx 128x96x160 128->96", 128, 96, 160, 128, 96),
        ("gen_enc 128x96x192 64->64", 128, 96, 192, 64, 64),
        # channel-count controls at fixed batch*spatial:
        ("ctl 64x96x160 64->64", 64, 96, 160, 64, 64),
        ("ctl 64x96x160 128->128", 64, 96, 160, 128, 128),
        ("ctl 64x96x160 256->256", 64, 96, 160, 256, 256),
        ("ctl 64x96x160 512->512", 64, 96, 160, 512, 512),
        # big-everything control (how conv-like can XLA get to the matmul
        # ceiling when nothing is small):
        ("ctl 256x64x64 512->512", 256, 64, 64, 512, 512),
    ]
    results = {}
    for label, b, h, w, ci, co in cases:
        x = jnp.asarray(rng.rand(b, h, w, ci) - 0.5, jnp.bfloat16)
        k = jnp.asarray(rng.rand(3, 3, ci, co) * 0.05, jnp.bfloat16)
        dt = timed(conv, (x, k))
        tf_s = 2.0 * b * h * w * 9 * ci * co / dt / 1e12
        results[label] = tf_s
        print(f"{label:36s}: {tf_s:6.1f} TFLOP/s ({dt * 1e3:7.2f} ms)",
              flush=True)

    best = max(results.items(), key=lambda kv: kv[1])
    model_best = max((v for k, v in results.items()
                      if not k.startswith("ctl")), default=0.0)
    print(f"\nconv-class ceiling at model-like shapes: {model_best:.1f} "
          f"TFLOP/s; best overall {best[1]:.1f} ({best[0]})", flush=True)


if __name__ == "__main__":
    main()
