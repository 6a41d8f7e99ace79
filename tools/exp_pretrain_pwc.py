#!/usr/bin/env python3
"""Pretrain PWC on the convergence experiment's scene distribution, on TPU.

Wraps train/pretrain_pwc.pretrain_pwc with the experiment's ON-DEVICE scene
generator (tools/exp_convergence_v2.make_batch_fn with_pairs=True): square +
affine-background pairs — the exact distribution the adversarial-game
experiment evaluates on, and no host<->device transfers (the remote-TPU
tunnel makes host-generated batches ~1 s/step).

Usage: python tools/exp_pretrain_pwc.py [steps] [batch] [H] [W] [ckpt_dir]
           [resume_ckpt] [scenes_version]

With resume_ckpt (a pwc-scope checkpoint file), training continues from
those params instead of a fresh init — used to extend the pretrain in
stages between experiment arms (optimizer moments restart; at a flat lr
with Adam this costs a brief re-warmup only).

scenes_version 2 (round 4) switches to tools/exp_scenes.make_scenes_v2
(multi-object, varied sizes, photometric noise) WITH object-upweighted
loss (PWC_OBJECT_WEIGHT, default 4.0) and region-EPE reporting — the
recipe fix for the round-3 failure where mean-EPE training on
single-small-square scenes never learned object motion (inside-EPE
16 px at 0.36 px background; tools/exp_flow_diag.py).

scenes_version 3 (late round 4) = v2 + sinusoidal per-object flow
residuals (deformable motion, PWC_DEFORM_AMP px, default 6) + a
boundary-band loss upweight (PWC_BOUNDARY_WEIGHT, default 8) on the
+-4 px ring around object edges — the recipe lever for the flow-edge
smear that bounds the adversarial game's locked-regime IoU
(ROADMAP round-4 item 3: boundary EPE ~7.8 px at every recipe so far).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("EXP_CPU"):
    jax.config.update("jax_platforms", "cpu")

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train.pretrain_pwc import pretrain_pwc
from unsupervised_detection_tpu.utils import enable_compilation_cache

sys.path.insert(0, os.path.join(REPO, "tools"))
from exp_convergence_v2 import make_batch_fn  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    W = int(sys.argv[4]) if len(sys.argv) > 4 else 384
    ckpt_dir = sys.argv[5] if len(sys.argv) > 5 else "/tmp/exp_pwc_ckpt"
    resume = sys.argv[6] if len(sys.argv) > 6 else ""
    scenes_version = int(sys.argv[7]) if len(sys.argv) > 7 else 1
    object_weight = float(os.environ.get("PWC_OBJECT_WEIGHT", "4.0"))
    enable_compilation_cache()
    os.makedirs(ckpt_dir, exist_ok=True)
    print(f"pwc-pretrain on device scenes: steps={steps} batch={batch} "
          f"res={H}x{W} ckpt={ckpt_dir} scenes=v{scenes_version} "
          f"platform={jax.devices()[0].platform}", flush=True)
    if jax.devices()[0].platform == "tpu" and H * W > 128 * 192:
        # The remote compile helper SIGKILLs on PWC backward above
        # 128x192 even at search_range=2 (verify skill, gotchas); the
        # run would sit in compilation until killed.
        print(f"WARNING: {H}x{W} PWC backward exceeds the remote "
              "compile-helper budget on the tunneled TPU; use <=128x192 "
              "(see .claude/skills/verify/SKILL.md).", flush=True)

    boundary_weight = 0.0
    if scenes_version >= 2:
        from exp_scenes import make_scenes_v2

        deform = (float(os.environ.get("PWC_DEFORM_AMP", "6.0"))
                  if scenes_version >= 3 else 0.0)
        if scenes_version >= 3:
            boundary_weight = float(
                os.environ.get("PWC_BOUNDARY_WEIGHT", "8.0"))
        make = make_scenes_v2(batch, H, W, deform_amp=deform)
        if scenes_version >= 3:
            print(f"v3 recipe: deform_amp={deform} px, "
                  f"boundary_weight={boundary_weight}", flush=True)
    else:
        make = make_batch_fn(batch, H, W, square=max(16, H // 4),
                             with_pairs=True)
        object_weight = 0.0  # v1 arms stay reproducible
    keybox = {"k": jax.random.PRNGKey(5)}

    def device_batches(_rng, _b, _h, _w):
        keybox["k"], k = jax.random.split(keybox["k"])
        img1, img2, flow80, gt = make(k)
        if scenes_version >= 2:  # pretrain targets pixel units
            return img1, img2, flow80 * 80.0, gt
        return img1, img2, flow80 * 80.0

    # search_range=2 (25 cost-volume shifts instead of 81): the full
    # backward at range 4 exceeds the remote AOT compile helper's budget
    # (SIGKILL after ~10 min); the experiment consumes the checkpoint with
    # the same range, so params stay consistent end to end.
    cfg = Config(batch_size=batch, reader_height=H, reader_width=W,
                 img_height=H, img_width=W, checkpoint_dir=ckpt_dir, seed=0,
                 pwc_search_range=2)
    params = None
    if resume:
        import jax.numpy as jnp

        from unsupervised_detection_tpu.models import PWCNet
        from unsupervised_detection_tpu.train import checkpoint as ckpt

        pwc = PWCNet(search_range=2)
        template = jax.jit(pwc.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)))["params"]
        params = ckpt.restore_checkpoint(resume, template)
        print(f"resumed params from {resume}", flush=True)
    # PWC_LR_SCHEDULE=cosine enables warmup+cosine decay (constant default
    # keeps earlier arms' runs reproducible).
    _, epe = pretrain_pwc(cfg, steps=steps, batch_fn=device_batches,
                          save_every=1000, params=params,
                          lr_schedule=os.environ.get("PWC_LR_SCHEDULE",
                                                     "constant"),
                          object_weight=object_weight,
                          boundary_weight=boundary_weight,
                          # "final" (default) = round-5 fixed band loss;
                          # "all" reproduces the v3 all-levels killer.
                          boundary_mode=os.environ.get("PWC_BOUNDARY_MODE",
                                                       "final"))
    print(f"done: final train EPE {epe:.3f} px; checkpoint at "
          f"{os.path.join(ckpt_dir, 'pwc-final')}", flush=True)


if __name__ == "__main__":
    main()
