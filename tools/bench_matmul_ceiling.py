#!/usr/bin/env python3
"""Defend (or fix) the chip's compute ceiling (VERDICT r3 item 4).

Round 3 reported MFU against a measured ~68 TFLOP/s chained-matmul ceiling,
2.9x below the v5e paper peak (197 TFLOP/s bf16). This sweep publishes the
calibration: the best TFLOP/s XLA achieves on this chip across matmul
shapes/depths and a PWC-like convolution, so the ceiling is a defended
number rather than an assumption.

Result (2026-08-19, this chip): single matmuls are dispatch-bound through
the tunnel (bf16 4096^3: 40.6 TFLOP/s) but chaining amortizes it —
**x8-chained bf16 4096: 127.3 TFLOP/s** (8192^3 single: 121.3; f32 4096:
34.9 = the expected 1/4 rate). The round-3 68 was an under-measurement;
bench.py now reports MFU against 127.3. Companion: bench_conv_ceiling.py
measures the conv-class ceiling at the model's own shapes.

Probes (all bf16 operands, f32 accumulation — the MXU-native mode):
  * single matmul (N x N) @ (N x N), N in {1024..8192} — HBM-amortization
    curve; large N is compute-bound (AI >> ridge point);
  * chained matmul x <- x @ W_i, depth 8, distinct weights — removes the
    output round-trip between FLOPs;
  * f32 single matmul at the best N (the fp32 parity-path ceiling);
  * 3x3 conv at PWC-estimator-like shape (the op class the flow net
    actually spends its FLOPs on).

Prints achieved TFLOP/s per probe and a final 'defended ceiling' line.
Usage: python tools/bench_matmul_ceiling.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_tflops(fn, args, flops, iters=10):
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out))  # sync through the tunnel (block_until_ready no-ops)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return flops / best / 1e12, best


def main():
    import jax
    import jax.numpy as jnp

    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    print("platform:", dev.platform, getattr(dev, "device_kind", "?"),
          flush=True)
    rng = np.random.RandomState(0)
    results = {}

    # --- single square matmuls ------------------------------------------
    for n in (1024, 2048, 4096, 8192):
        a = jnp.asarray(rng.rand(n, n) - 0.5, jnp.bfloat16)
        b = jnp.asarray(rng.rand(n, n) - 0.5, jnp.bfloat16)
        f = jax.jit(lambda x, y: jnp.dot(x, y,
                                         preferred_element_type=jnp.float32))
        tf_s, dt = timed_tflops(f, (a, b), 2.0 * n ** 3)
        results[f"matmul_bf16_{n}"] = tf_s
        print(f"matmul bf16 {n}x{n}x{n}: {tf_s:6.1f} TFLOP/s ({dt*1e3:.2f} ms)",
              flush=True)

    # --- chained matmuls (depth 8) ---------------------------------------
    for n in (2048, 4096):
        depth = 8
        ws = [jnp.asarray(rng.rand(n, n) * 0.02 - 0.01, jnp.bfloat16)
              for _ in range(depth)]
        x = jnp.asarray(rng.rand(n, n) - 0.5, jnp.bfloat16)

        @jax.jit
        def chain(x, *ws):
            for w in ws:
                x = jnp.dot(x, w, preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            return x

        tf_s, dt = timed_tflops(chain, (x, *ws), 2.0 * depth * n ** 3)
        results[f"chain_bf16_{n}"] = tf_s
        print(f"chained x8 bf16 {n}: {tf_s:6.1f} TFLOP/s ({dt*1e3:.2f} ms)",
              flush=True)

    # --- f32 matmul -------------------------------------------------------
    n = 4096
    a = jnp.asarray(rng.rand(n, n) - 0.5, jnp.float32)
    b = jnp.asarray(rng.rand(n, n) - 0.5, jnp.float32)
    f = jax.jit(lambda x, y: jnp.dot(x, y))
    tf_s, dt = timed_tflops(f, (a, b), 2.0 * n ** 3)
    results["matmul_f32_4096"] = tf_s
    print(f"matmul f32 {n}: {tf_s:6.1f} TFLOP/s ({dt*1e3:.2f} ms)", flush=True)

    # --- PWC-like conv ----------------------------------------------------
    # L2-estimator-ish: 3x3, 128->128 channels at 96x160, batch 64.
    bsz, h, w, c = 64, 96, 160, 128
    img = jnp.asarray(rng.rand(bsz, h, w, c) - 0.5, jnp.bfloat16)
    ker = jnp.asarray(rng.rand(3, 3, c, c) * 0.05, jnp.bfloat16)

    @jax.jit
    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    flops = 2.0 * bsz * h * w * 9 * c * c
    tf_s, dt = timed_tflops(conv, (img, ker), flops)
    results["conv3x3_bf16"] = tf_s
    print(f"conv 3x3 bf16 {bsz}x{h}x{w}x{c}->{c}: {tf_s:6.1f} TFLOP/s "
          f"({dt*1e3:.2f} ms)", flush=True)

    best = max(results.items(), key=lambda kv: kv[1])
    print(f"\ndefended ceiling: {best[1]:.1f} TFLOP/s ({best[0]}); "
          f"{best[1] / 197.0 * 100:.0f}% of the 197 TFLOP/s v5e bf16 paper "
          "peak — the gap, if any, is the chip/slice itself (tunneled "
          "virtual slice), not the model code.", flush=True)
    print({k: round(v, 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
