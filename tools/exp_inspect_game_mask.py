#!/usr/bin/env python3
"""Inspect WHAT a game-arm generator is masking, on CPU, mid-run.

Loads a game-arm checkpoint payload (tools/exp_convergence_v2.py format),
rebuilds the exact val batch (PRNGKey 999, the driver's fixed val set),
runs the frozen PWC -> generator path, and reports per-sample mask
geometry vs the ground-truth square: IoU, mask area, the fraction of mask
pixels inside the square, centroid offset, and connected components —
enough to tell a misplaced-lock from a fragmented or hallucination-driven
attractor without touching the TPU the run owns.

Usage:
  python tools/exp_inspect_game_mask.py <game_ckpt> <pwc_ckpt> [H W batch]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from unsupervised_detection_tpu.config import Config  # noqa: E402
from unsupervised_detection_tpu.models import RecoverNet  # noqa: E402
from unsupervised_detection_tpu.train import checkpoint as ckptmod  # noqa: E402
from unsupervised_detection_tpu.train.learner import TrainState  # noqa: E402
from unsupervised_detection_tpu.train.objective import (  # noqa: E402
    AdversarialObjective)
from unsupervised_detection_tpu.train.optim import adam_init  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "tools"))
from exp_convergence_v2 import make_batch_fn  # noqa: E402


def main():
    game_ckpt = sys.argv[1]
    pwc_ckpt = sys.argv[2]
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    W = int(sys.argv[4]) if len(sys.argv) > 4 else 384
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 16

    cfg = Config(img_height=H, img_width=W, batch_size=batch,
                 reader_height=H, reader_width=W, compute_dtype="float32",
                 allow_random_flow=True, pwc_search_range=2)
    obj = AdversarialObjective(cfg)
    obj.recover = RecoverNet(f=0.25, dtype=obj.dtype)

    rng = jax.random.PRNGKey(8964)
    r_gen, r_rec, _ = jax.random.split(rng, 3)
    img_w = jnp.zeros((1, H, W, 3), jnp.float32)
    flow_w = jnp.zeros((1, H, W, 2), jnp.float32)
    mask_w = jnp.zeros((1, H, W, 1), jnp.float32)
    gen_vars = jax.jit(obj.generator.init)(r_gen, img_w, flow_w)
    rec_vars = jax.jit(obj.recover.init)(r_rec, img_w, flow_w, mask_w)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), rng=jnp.zeros((2,), jnp.uint32),
        gen_params=gen_vars["params"], gen_stats=gen_vars["batch_stats"],
        rec_params=rec_vars["params"], pwc_params={},
        gen_opt=adam_init(gen_vars["params"]),
        rec_opt=adam_init(rec_vars["params"]),
    )
    payload = {"state": state, "data_key": jnp.zeros((2,), jnp.uint32),
               "cycle": np.int32(0), "best": np.float32(0.0)}
    try:
        payload = ckptmod.restore_checkpoint(
            game_ckpt, dict(payload, lr_scale=np.float32(1.0)))
    except Exception:
        payload = ckptmod.restore_checkpoint(game_ckpt, payload)
    state = payload["state"]
    print(f"loaded {game_ckpt} at cycle {int(payload['cycle'])} "
          f"(best {float(payload['best']):.3f})", flush=True)

    pwc_template = jax.jit(obj.pwc.init)(
        jax.random.PRNGKey(0), img_w, img_w)["params"]
    pwc_params = ckptmod.restore_checkpoint(pwc_ckpt, pwc_template)

    make = make_batch_fn(batch, H, W, max(16, H // 4), with_pairs=True)
    img1, img2, gt80, gt = make(jax.random.PRNGKey(999))

    @jax.jit
    def run(img1, img2):
        flow = obj.compute_flow(pwc_params, img1, img2)
        image, flow = obj.resize_to_working(img1, flow)
        mask = obj.generate_mask(state.gen_params, state.gen_stats,
                                 image, flow)
        return mask

    mask = np.asarray(run(img1, img2))[..., 0] > 0.5
    gt_np = np.asarray(gt)[..., 0] > 0.5

    try:
        from scipy import ndimage
    except ImportError:
        ndimage = None

    print("  b   IoU  area%  in-gt%  d-centroid  ncomp")
    for b in range(batch):
        m, g = mask[b], gt_np[b]
        inter, union = (m & g).sum(), (m | g).sum()
        iou = inter / union if union else 0.0
        area = m.mean()
        ingt = (m & g).sum() / max(m.sum(), 1)
        if m.sum():
            my, mx = np.argwhere(m).mean(axis=0)
        else:
            my, mx = np.nan, np.nan
        gy, gx = np.argwhere(g).mean(axis=0)
        dist = np.hypot(my - gy, mx - gx) if m.sum() else np.nan
        ncomp = ndimage.label(m)[1] if ndimage is not None else -1
        print(f"{b:3d}  {iou:.3f}  {100 * area:5.1f}  {100 * ingt:5.1f}"
              f"  {dist:9.1f}  {ncomp:5d}")
    print(f"mean IoU {np.mean([( (mask[b] & gt_np[b]).sum() / max((mask[b] | gt_np[b]).sum(), 1)) for b in range(batch)]):.3f}")


if __name__ == "__main__":
    main()
