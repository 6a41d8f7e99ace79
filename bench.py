#!/usr/bin/env python3
"""Benchmark: flow+mask inference throughput (frames/sec) on TPU.

This is the reference pipeline's benchmarked configuration (BASELINE.json:
"DAVIS2016 raw inference" — PWCNet flow at 640x384 + generator mask at
384x192 per frame pair). The reference publishes no throughput numbers
(BASELINE.md); the north star is >=10x an estimated TF1-era single-GPU
throughput. We document the assumed TF1-GPU baseline as 25 frames/sec and
report vs_baseline = fps / 25.0 so the driver can track the 10x goal as
vs_baseline >= 10.

Basis for the 25 fps assumption (tools/bench_reference_tf1.py measures the
anchor): the reference's own TF1 graph — built from its verbatim modules —
runs 0.69 fps on this host's CPU (fp32, batch 4). A 2019-class GPU (the
reference's documented environment is TF 1.13/CUDA 10.1) delivers roughly
30-50x CPU throughput on conv workloads, bracketing the TF1-GPU figure at
~20-35 fps; PWC-Net-class models are commonly quoted at ~30-40 fps at this
resolution on such GPUs, and the reference adds the generator forward on
top. 25 fps sits mid-bracket; even at the most generous 35 fps estimate the
measured 516 fps parity number is 14.7x, and 20.6x at the midpoint.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys

ASSUMED_TF1_GPU_FPS = 25.0


def main():
    import os
    import threading

    # Backend-init watchdog: through the remote-TPU tunnel, jax.devices()
    # HANGS indefinitely when the tunnel is down (observed multi-hour
    # outages). Normal init takes seconds; if it hasn't completed in 10
    # minutes, emit an honest failure record instead of hanging the caller.
    def _fire():
        print(json.dumps({
            "metric": "davis2016_flow_mask_inference_fps", "value": 0.0,
            "unit": "frames/sec/chip", "vs_baseline": 0.0,
            "error": "backend init did not complete within 600s "
                     "(remote TPU tunnel unreachable?)"}), flush=True)
        os._exit(3)

    watchdog = threading.Timer(600, _fire)
    watchdog.daemon = True
    watchdog.start()

    import jax

    from unsupervised_detection_tpu.config import Config
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    watchdog.cancel()

    args = sys.argv[1:]
    # Batch 128 default: the concat-free estimator + major-axis costvol stack
    # made large batches fit (round 1 OOM'd at 64 on lane-padded stack
    # copies); measured parity fps by batch: 32 -> 233, 64 -> 343,
    # 128 -> 516, 192 -> 400 (2026-08-17). 128 is the sweet spot.
    batch = int(args[0]) if args else 128
    modes = set(args[1:])
    compute_dtype = "float32" if "float32" in modes else "bfloat16"
    unknown = modes - {"float32", "bfloat16", "pallas", "fast", "window",
                       "quad"}
    if unknown:
        raise SystemExit(f"Unknown bench mode(s): {sorted(unknown)}; "
                         "expected float32|bfloat16|pallas|fast|window|quad")
    use_pallas = "pallas" in modes
    # Warp default is the gather-free Pallas window kernel with its runtime
    # exactness guard (ops/warp.py _warp_window) on the large PWC levels:
    # identical bilinear taps up to fp reassociation — a strictly smaller
    # numerical deviation than the bf16 default — measured 569 vs 516 fps
    # at batch 128 (2026-08-19). "quad" selects the bit-exact gather
    # formulation (the round-3 parity number). The window kernel's
    # cost_estimate adds ~6 GFLOP/frame of kernel-padded one-hot-matmul
    # compute to the cost-analysis count, so the MFU headline below is
    # computed against the CANONICAL quad program's FLOPs (useful work);
    # the raw program MFU is reported alongside, labeled.
    warp_method = "quad" if "quad" in modes else "window"
    # Non-parity throughput mode: "fast" runs the flow net at half reader
    # resolution (~1495 fps/chip at batch 128 vs 516 parity; the generator
    # input is standardized flow, so magnitudes cancel). Parity mode is the
    # reported default.
    flow_div = 2 if "fast" in modes else 1

    cfg = Config(batch_size=batch, compute_dtype=compute_dtype,
                 use_pallas=use_pallas, flow_resolution_divisor=flow_div,
                 warp_method=warp_method)
    # Shared builder (jitted inits, checksum sync, cost_analysis unwrap):
    # the same program __graft_entry__.entry exposes to the driver and
    # tools/bench_batch_sweep.py sweeps.
    from unsupervised_detection_tpu import benchlib

    forward, example_args = benchlib.build_forward(cfg)
    args = example_args[:3] + benchlib.random_images(cfg)

    # Analytic FLOP accounting from the compiled program itself: XLA's
    # cost analysis counts every HLO's FLOPs (convs dominate; an MXU
    # multiply-add counts as 2). This makes the MFU claim falsifiable:
    # mfu = fps * flops/frame / ceiling. Ceilings measured on this chip
    # (2026-08-19; tools/bench_matmul_ceiling.py + bench_conv_ceiling.py,
    # table in ROADMAP "Perf context"):
    #   v5e bf16 paper peak                 197   TFLOP/s
    #   chained-matmul ceiling (bf16 4096)  127.3 (134.7 for 512-ch conv)
    #   conv-class ceiling at the model's parity-fixed shapes: 12-74
    #     per shape (3x3, 32..128 ch at 96x160 and below)
    # MFU is reported against the 127.3 measured-chip ceiling and the paper
    # peak. The model's achieved rate lands inside the conv-class band of
    # its own shapes — the distance to 127 is the cost of the reference's
    # channel widths (parity-locked), not scheduling slack.
    compiled = jax.jit(forward).lower(*args).compile()
    total_flops = benchlib.cost_flops(compiled)
    flops_per_frame = total_flops / batch if total_flops is not None else None
    if flops_per_frame is None:  # backend-dependent; fps still reports
        print("cost_analysis unavailable", file=sys.stderr)

    best = benchlib.time_compiled(compiled, args)
    fps = batch / best
    record = {
        "metric": "davis2016_flow_mask_inference_fps",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / ASSUMED_TF1_GPU_FPS, 2),
    }
    if flops_per_frame is not None:
        # Useful-work accounting (VERDICT r4 weak 5): the window warp
        # kernel self-declares its one-hot-resample matmul FLOPs
        # (ops/pallas/warp_kernel.py cost_estimate) — real MXU work, but
        # overhead the ALGORITHM doesn't require (the quad gather resamples
        # the same taps with zero matmul FLOPs). MFU headline therefore
        # counts the CANONICAL program's FLOPs (the bit-exact quad
        # formulation, 117.9 GF/frame at the parity config) at the
        # achieved fps; the raw cost-analysis MFU of the program actually
        # run is reported alongside, labeled.
        useful_per_frame = flops_per_frame
        if cfg.warp_method != "quad":
            qcfg = Config(batch_size=batch, compute_dtype=compute_dtype,
                          use_pallas=use_pallas,
                          flow_resolution_divisor=flow_div,
                          warp_method="quad")
            qforward, qargs = benchlib.build_forward(qcfg)
            qflops = benchlib.cost_flops(
                jax.jit(qforward).lower(*(qargs[:3]
                                          + benchlib.random_images(qcfg)))
                .compile())
            if qflops is not None:
                useful_per_frame = qflops / batch
        useful = fps * useful_per_frame
        raw = fps * flops_per_frame
        record.update({
            "flops_per_frame": round(useful_per_frame / 1e9, 2),  # GFLOP
            "achieved_tflops": round(useful / 1e12, 2),
            "mfu_vs_measured_chip_ceiling_127tflops":
                round(useful / 127.3e12, 3),
            "mfu_vs_v5e_bf16_peak_197tflops": round(useful / 197e12, 3),
            "raw_program_flops_per_frame": round(flops_per_frame / 1e9, 2),
            "raw_cost_analysis_mfu_vs_127tflops": round(raw / 127.3e12, 3),
        })
    print(json.dumps(record))


if __name__ == "__main__":
    main()
