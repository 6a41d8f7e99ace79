#!/usr/bin/env python3
"""Does the adversarial game converge to the moving object?

Trains generator+recover from scratch on synthetic (image, flow) pairs with
a known moving square — the background carries a smooth random affine flow
field and the square an independent affine field (see make_batch), so the
contextual-information-separation optimum is exactly the square mask.
PWC is bypassed (losses_from_flow) to isolate the two-player dynamics: same
losses, clip/noise rule, shared-step TF1 Adam, and 1:3 alternation as real
training (reference adversarial_learner.py:206-240,367-389).

The recover net is warm-started with box-occlusion inpainting pretraining
(train/pretrain.random_box_masks) before the adversarial phase — the same
protocol as the reference, which initializes the recover from a FlyingChairs
inpainting checkpoint (README.md:83-87); from-scratch recover makes the toy
game collapse into the all-mask minimum after ~250 cycles.

Usage: python tools/exp_convergence_synth.py [cycles] [batch] [pretrain_steps]
Prints IoU of the disambiguated mask vs the square every 25 cycles.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

# The installed TPU plugin ignores JAX_PLATFORMS; force the CPU backend so
# this experiment never dials (or blocks on) the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.ops.metrics import compute_all_iou
from unsupervised_detection_tpu.train.learner import TrainState, _clip_or_noise
from unsupervised_detection_tpu.train.objective import AdversarialObjective
from unsupervised_detection_tpu.train.optim import adam_apply, adam_init

H, W = 64, 128
SQUARE = 28


def make_batch(rng: np.random.RandomState, batch: int):
    """Images with a textured square; background flow is a smooth random
    affine field (predictable from context, like real camera motion), the
    square carries an independent affine field. The contextual-information
    -separation optimum is then exactly the square: any other partition
    leaks an extrapolatable field across the mask boundary."""
    img = rng.rand(batch, H, W, 3).astype(np.float32) * 0.08 - 0.5
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    yy, xx = (yy - H / 2) / H, (xx - W / 2) / W
    flow = np.zeros((batch, H, W, 2), np.float32)
    gt = np.zeros((batch, H, W, 1), np.float32)
    for b in range(batch):
        y = rng.randint(0, H - SQUARE)
        x = rng.randint(0, W - SQUARE)
        img[b, y : y + SQUARE, x : x + SQUARE] += 0.35
        for ch in range(2):  # background: affine a + b*x + c*y
            a, bb, cc = rng.uniform(-6.0, 6.0), rng.uniform(-8, 8), rng.uniform(-8, 8)
            flow[b, :, :, ch] = a + bb * xx + cc * yy
        box = np.s_[y : y + SQUARE, x : x + SQUARE]
        for ch in range(2):  # square: independent affine
            a, bb, cc = rng.uniform(-12.0, 12.0), rng.uniform(-8, 8), rng.uniform(-8, 8)
            flow[b][box + (ch,)] = a + bb * xx[box] + cc * yy[box]
        gt[b][box] = 1.0
    return img, flow / 80.0, gt


def main():
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    pretrain_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    cfg = Config(img_height=H, img_width=W, batch_size=batch,
                 compute_dtype="float32", allow_random_flow=True)
    obj = AdversarialObjective(cfg)
    hparams = (cfg.learning_rate, cfg.beta1, 0.999, cfg.adam_epsilon)

    rng = jax.random.PRNGKey(8964)
    r_gen, r_rec, r_state = jax.random.split(rng, 3)
    img_w = jnp.zeros((1, H, W, 3), jnp.float32)
    flow_w = jnp.zeros((1, H, W, 2), jnp.float32)
    mask_w = jnp.zeros((1, H, W, 1), jnp.float32)
    gen_vars = obj.generator.init(r_gen, img_w, flow_w)
    rec_vars = obj.recover.init(r_rec, img_w, flow_w, mask_w)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), rng=r_state,
        gen_params=gen_vars["params"], gen_stats=gen_vars["batch_stats"],
        rec_params=rec_vars["params"], pwc_params={},
        gen_opt=adam_init(gen_vars["params"]),
        rec_opt=adam_init(rec_vars["params"]),
    )

    def gen_step(state, image, flow):
        rng, r_noise = jax.random.split(state.rng)

        def loss_fn(p):
            out = obj.losses_from_flow(p, state.gen_stats, state.rec_params, image, flow)
            return out.losses["generator"], out.losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.gen_params)
        grads = _clip_or_noise(r_noise, grads, cfg.gradient_clip,
                               cfg.grad_noise_threshold, True)
        p, o = adam_apply(grads, state.gen_opt, state.gen_params,
                          state.shared_adam_t, *hparams)
        return state.replace(rng=rng, gen_params=p, gen_opt=o), losses

    def rec_step(state, image, flow):
        rng, r_noise = jax.random.split(state.rng)

        def loss_fn(p):
            out = obj.losses_from_flow(state.gen_params, state.gen_stats, p, image, flow)
            return out.losses["recover"], out.losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.rec_params)
        grads = _clip_or_noise(r_noise, grads, cfg.gradient_clip,
                               cfg.grad_noise_threshold, False)
        p, o = adam_apply(grads, state.rec_opt, state.rec_params,
                          state.shared_adam_t, *hparams)
        return state.replace(rng=rng, rec_params=p, rec_opt=o), losses

    def val_iou(state, image, flow, gt):
        mask = obj.generate_mask(state.gen_params, state.gen_stats, image,
                                 flow)
        return (jnp.mean(compute_all_iou(pred_masks=mask, gt_masks=gt)),
                jnp.mean(mask))

    gen_step = jax.jit(gen_step, donate_argnums=(0,))
    rec_step = jax.jit(rec_step, donate_argnums=(0,))
    val_iou = jax.jit(val_iou)

    # Recover warm start: box-occlusion flow inpainting (the reference's
    # FlyingChairs pretrain stage, train/pretrain.py).
    from unsupervised_detection_tpu.train.pretrain import random_box_masks
    from unsupervised_detection_tpu.ops.losses import charbonnier_loss

    def pre_step(state, image, flow, r_mask):
        rng, _ = jax.random.split(state.rng)
        mask = random_box_masks(r_mask, image.shape[0], H, W)

        def loss_fn(p):
            pred = obj.recover.apply({"params": p}, image, flow * (1 - mask), mask)
            tot = charbonnier_loss(flow, pred, jnp.ones_like(flow), cfg.cbn)
            return jnp.sum(tot) / (H * W * image.shape[0])

        loss, grads = jax.value_and_grad(loss_fn)(state.rec_params)
        grads = jax.tree.map(
            lambda g: jnp.clip(g, -cfg.gradient_clip, cfg.gradient_clip), grads)
        p, o = adam_apply(grads, state.rec_opt, state.rec_params,
                          state.rec_opt.count + 1, *hparams)
        return state.replace(rng=rng, rec_params=p, rec_opt=o), loss

    pre_step = jax.jit(pre_step, donate_argnums=(0,))
    nprng = np.random.RandomState(0)
    prng = jax.random.PRNGKey(7)
    for i in range(1, pretrain_steps + 1):
        img, flow, _ = make_batch(nprng, batch)
        prng, r_mask = jax.random.split(prng)
        state, ploss = pre_step(state, img, flow, r_mask)
        if i % 50 == 0:
            print(f"pretrain {i:4d}  inpaint loss {float(ploss):.4f}", flush=True)
    # Fresh recover Adam state for the adversarial phase (the reference's
    # optimizer starts at t=0 after restoring the pretrained scope).
    state = state.replace(rec_opt=adam_init(state.rec_params))
    val_img, val_flow, val_gt = make_batch(np.random.RandomState(999), 16)
    sub = 0
    cyc = cfg.iters_rec + cfg.iters_gen
    for cycle in range(1, cycles + 1):
        for _ in range(cyc):
            img, flow, _ = make_batch(nprng, batch)
            step = rec_step if (sub % cyc) < cfg.iters_rec else gen_step
            state, losses = step(state, img, flow)
            sub += 1
        if cycle % 25 == 0 or cycle == 1:
            iou, mcov = val_iou(state, val_img, val_flow, val_gt)
            print(f"cycle {cycle:4d}  IoU {float(iou):.3f}  "
                  f"mask-cover {float(mcov):.2f}  "
                  f"gen {float(losses['generator']):+.4f}  "
                  f"rec {float(losses['recover']):.4f}", flush=True)
    iou, _ = val_iou(state, val_img, val_flow, val_gt)
    print(f"final IoU {float(iou):.3f}")


if __name__ == "__main__":
    main()
