#!/usr/bin/env python3
"""Flow-quality diagnostic for the adversarial-game flow arms (round 4).

Round-3 bracket: GT flow (0 px) transitions at ~1150 cycles; PWC flow at
2.35 px val EPE (stage-2 ckpt evaluated off-distribution at 192x384) does
not transition in 5650 cycles. This tool breaks the EPE down by REGION
(inside the square / boundary band / background) for each candidate flow
path, because the game's signal lives at the motion boundary: a mean EPE
dominated by background smoothness can hide a square whose motion the
flow net never captured.

Paths measured (all use the same frozen checkpoint):
  native   scenes at 128x192 (square 32)  — PWC's training distribution
  fullres  scenes at 192x384 (square 48)  — the failed round-3 arm
  divisor  scenes at 256x384 (square 64), PWC on 2x-downscaled frames
           (=128x192, its native res), flow x2 + resized to the 192x384
           working res — the reference's own architecture shape
           (adversarial_learner.py:82-97: PWC at 640x384, game at 384x192).

Usage: python tools/exp_flow_diag.py <pwc_ckpt> [batch]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("EXP_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.ops.resize import resize_bilinear
from unsupervised_detection_tpu.train import checkpoint as ckpt
from unsupervised_detection_tpu.train.objective import AdversarialObjective
from unsupervised_detection_tpu.utils import enable_compilation_cache

sys.path.insert(0, os.path.join(REPO, "tools"))
from exp_convergence_v2 import make_batch_fn  # noqa: E402


def region_masks(gt, band_px=4):
    """inside / boundary band / outside masks from the [B,H,W,1] gt mask."""
    window = 2 * band_px + 1
    dil = jax.lax.reduce_window(gt, -jnp.inf, jax.lax.max,
                                (1, window, window, 1), (1, 1, 1, 1), "SAME")
    ero = -jax.lax.reduce_window(-gt, -jnp.inf, jax.lax.max,
                                 (1, window, window, 1), (1, 1, 1, 1), "SAME")
    band = (dil > 0.5) & (ero < 0.5)
    inside = (gt > 0.5) & ~band
    outside = (gt <= 0.5) & ~band
    return inside, band, outside


def report(name, est80, gt80, gt):
    """est80/gt80: flow in common pixel units. gt: [B,H,W,1] square mask."""
    err = jnp.linalg.norm(est80 - gt80, axis=-1, keepdims=True)
    inside, band, outside = region_masks(gt)

    def mean_in(m):
        return float(jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1))

    print(f"{name:8s}  EPE px: overall {float(jnp.mean(err)):6.2f}  "
          f"inside {mean_in(inside):6.2f}  boundary {mean_in(band):6.2f}  "
          f"background {mean_in(outside):6.2f}", flush=True)


def main():
    pwc_ckpt = sys.argv[1]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    enable_compilation_cache()
    print(f"flow diag: ckpt={pwc_ckpt} batch={batch} "
          f"platform={jax.devices()[0].platform}", flush=True)

    def load(cfg, H, W):
        obj = AdversarialObjective(cfg)
        template = jax.jit(obj.pwc.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)))["params"]
        return obj, ckpt.restore_checkpoint(pwc_ckpt, template)

    key = jax.random.PRNGKey(999)  # the game's val batch key

    # --- native 128x192 ----------------------------------------------------
    cfg = Config(reader_height=128, reader_width=192, img_height=128,
                 img_width=192, batch_size=batch, pwc_search_range=2)
    obj, params = load(cfg, 128, 192)
    img1, img2, gt80, gt = make_batch_fn(batch, 128, 192, 32,
                                         with_pairs=True)(key)
    est = jax.jit(lambda a, b: obj.compute_flow(params, a, b))(img1, img2)
    report("native", est, gt80 * 80.0, gt)

    # --- full-res 192x384 (the failed round-3 arm) --------------------------
    cfg = Config(reader_height=192, reader_width=384, img_height=192,
                 img_width=384, batch_size=batch, pwc_search_range=2)
    obj, params = load(cfg, 192, 384)
    img1, img2, gt80, gt = make_batch_fn(batch, 192, 384, 48,
                                         with_pairs=True)(key)
    est = jax.jit(lambda a, b: obj.compute_flow(params, a, b))(img1, img2)
    report("fullres", est, gt80 * 80.0, gt)

    # --- divisor path: reader 256x384, PWC at 128x192, working 192x384 -----
    cfg = Config(reader_height=256, reader_width=384, img_height=192,
                 img_width=384, batch_size=batch, pwc_search_range=2,
                 flow_resolution_divisor=2)
    obj, params = load(cfg, 128, 192)
    img1, img2, gt80, gt = make_batch_fn(batch, 256, 384, 64,
                                         with_pairs=True)(key)

    def div_flow(a, b):
        flow = obj.compute_flow(params, a, b)
        _, flow = obj.resize_to_working(a, flow)
        return flow * cfg.flow_normalizer  # reader-pixel units

    est = jax.jit(div_flow)(img1, img2)
    gt_w = resize_bilinear(gt80 * 80.0, (192, 384))
    gt_m = (resize_bilinear(gt, (192, 384)) > 0.5).astype(jnp.float32)
    report("divisor", est, gt_w, gt_m)

    # sanity: fraction of square pixels whose estimated flow is closer to the
    # square's GT motion than to the background's — "did PWC see the object?"
    print("done", flush=True)


if __name__ == "__main__":
    main()
