#!/usr/bin/env python3
"""Batch sweep of the parity inference program: fps + compiled-memory stats.

Explains the batch-size fps curve (233/343/516/400 at 32/64/128/192 in
round 2) with evidence from the compiled programs themselves: XLA's
memory_analysis() (argument/output/temp/code bytes — temp growth beyond
linear indicates HBM-pressure-driven scheduling or spilling) and
cost_analysis() FLOPs, alongside measured fps.

Usage: python tools/bench_batch_sweep.py [warp=window|quad] [batch ...]
       (default warp=quad, batches 64 96 128 160 192 256)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch, warp_method="quad"):
    import jax

    from unsupervised_detection_tpu import benchlib
    from unsupervised_detection_tpu.config import Config

    cfg = Config(batch_size=batch, compute_dtype="bfloat16",
                 warp_method=warp_method)
    forward, example_args = benchlib.build_forward(cfg)
    args = example_args[:3] + benchlib.random_images(cfg)

    compiled = jax.jit(forward).lower(*args).compile()
    rec = {"batch": batch, "warp": warp_method}
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
    flops = benchlib.cost_flops(compiled)
    if flops is not None:
        rec["gflop_per_frame"] = round(flops / batch / 1e9, 2)

    best = benchlib.time_compiled(compiled, args)
    rec["fps"] = round(batch / best, 1)
    rec["ms_per_batch"] = round(best * 1e3, 2)
    return rec


def main():
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    warp = "quad"
    rest = []
    for a in sys.argv[1:]:
        if a.startswith("warp="):
            warp = a.split("=", 1)[1]
        else:
            rest.append(int(a))
    batches = rest or [64, 96, 128, 160, 192, 256]
    for b in batches:
        print(json.dumps(measure(b, warp)), flush=True)


if __name__ == "__main__":
    main()
