#!/usr/bin/env python3
"""End-to-end eval throughput at REAL DAVIS shapes, host pipeline included.

The device-tensor bench (bench.py) feeds pre-staged arrays; this one measures
the full raw path the reference's tf.data pipeline covers
(davis2016_data_utils.py:222-226): 854x480 JPEG decode -> uint8 upload ->
on-device resize/normalize -> jitted flow+mask inference -> per-frame
IoU/MAE. A synthetic DAVIS2016 tree at the real resolution is generated on
first use (no DAVIS data in this environment).

Three measurements:
  * loader-only — host JPEG decode+batch capacity with the configured thread
    pool (no device): proves whether the host can sustain the device rate;
  * metrics-only e2e — evaluate_dataset's default path (IoU/MAE reduced on
    device, two scalars/frame fetched);
  * dense e2e — the visualization path (masks/flows/images fetched).

On this environment the TPU sits behind a network tunnel (measured ~35 MB/s
up, ~20 MB/s down, ~33 ms scalar roundtrip) so e2e numbers here are
transfer-bound, not host- or device-bound; the loader-only number is the
host-pipeline verdict. Usage: python tools/bench_e2e_eval.py [batch] [threads]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

ROOT = "/tmp/e2e_davis_854x480"
SEQS = ("bench_a", "bench_b", "bench_c", "bench_d")
FRAMES = 160  # per sequence; val = 3 sequences = 480 frames per pass


def ensure_data():
    marker = os.path.join(ROOT, "ImageSets/480p/val.txt")
    if os.path.exists(marker):
        return
    from synthetic import make_moving_square_davis

    make_moving_square_davis(
        ROOT, sequences=SEQS, frames=FRAMES, hw=(480, 854), square=96)
    # make_moving_square_davis puts seq 0 in train, the rest in val.


def time_pass(fn, label):
    n, dt = fn()
    print(f"{label}: {n} frames in {dt:.2f} s -> {n/dt:.1f} fps")
    return n / dt


def main():
    from unsupervised_detection_tpu.config import Config
    from unsupervised_detection_tpu.data.davis import Davis2016Reader
    from unsupervised_detection_tpu.data.loader import TestPipeline
    from unsupervised_detection_tpu.eval.evaluator import evaluate_dataset
    from unsupervised_detection_tpu.train.learner import AdversarialLearner
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    num_threads = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    ensure_data()

    cfg = Config(batch_size=batch, compute_dtype="bfloat16",
                 root_dir=ROOT, num_threads=num_threads,
                 allow_random_flow=True)

    # 1. Host loader capacity: decode 854x480 JPEGs + stack batches, no device.
    reader = Davis2016Reader(ROOT)
    ds = reader.dataset("val")

    def loader_pass():
        pipeline = TestPipeline(
            ds, batch, cfg.test_temporal_shift,
            reader_hw=(cfg.reader_height, cfg.reader_width),
            raw_hw=(reader.raw_height, reader.raw_width),
            num_threads=num_threads,
        )
        n = 0
        t0 = time.perf_counter()
        for b in pipeline:
            n += b["img1_raw"].shape[0]
        return n, time.perf_counter() - t0

    time_pass(loader_pass, "loader warmup (page cache)")
    loader_fps = max(time_pass(loader_pass, f"loader-only pass 2"),
                     time_pass(loader_pass, f"loader-only pass 3"))

    # 2/3. Full eval through the device (random-init weights; throughput only).
    import jax

    from unsupervised_detection_tpu.eval.evaluator import Evaluator

    state = AdversarialLearner(cfg).init_state(jax.random.PRNGKey(0))
    evaluator = Evaluator(cfg)

    def eval_pass(dense):
        kw = {}
        if dense:
            kw = dict(save_dir="/tmp/e2e_viz", generate_visualization=True)
        t0 = time.perf_counter()
        results = evaluate_dataset(cfg, state, verbose=False,
                                   evaluator=evaluator, **kw)
        return results["frames"], time.perf_counter() - t0

    time_pass(lambda: eval_pass(False), "e2e warmup (compile)")
    e2e_fps = max(time_pass(lambda: eval_pass(False), "e2e metrics-only pass 2"),
                  time_pass(lambda: eval_pass(False), "e2e metrics-only pass 3"))
    dense_fps = time_pass(lambda: eval_pass(True), "e2e dense/visualization")

    print(json.dumps({
        "metric": "davis2016_e2e_eval_fps_854x480_jpeg",
        "value": round(e2e_fps, 2),
        "unit": "frames/sec/chip",
        "loader_only_fps": round(loader_fps, 2),
        "dense_path_fps": round(dense_fps, 2),
        "num_threads": num_threads,
        "batch": batch,
    }))


if __name__ == "__main__":
    main()
