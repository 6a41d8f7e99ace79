#!/usr/bin/env python3
"""In-regime adversarial-convergence experiment (VERDICT round-2 item 4).

tools/exp_convergence_synth.py showed the two-player game lifting IoU to
0.25-0.46 then settling into half-coverage masks at 64x128 with a 200-step
recover warm start. This version moves the toy INTO the reference's regime
and runs on the real TPU chip:

  * working resolution 192x384 (the reference's, common_flags.py:6-7) —
    flag-selectable down to 96x192 for quick runs;
  * recover channel multiplier f as a flag (0.25 = reference nets.py:49;
    1.0 = capacity-ablation arm);
  * batch 16, Adam 1e-4, shared-step TF1 Adam, clip/noise, 1:3 alternation
    (adversarial_learner.py:206-240,367-389) — the exact reference recipe;
  * thousands of cycles (the reference trains 12,500);
  * longer recover warm start (box inpainting, the FlyingChairs protocol).

Scene generator: textured background under a smooth random affine flow
(extrapolatable from context, like camera motion) and a textured square
carrying an independent affine flow. The contextual-information-separation
optimum is exactly the square. Flow is in reader-pixel units scaled to the
magnitudes the /80 normalizer expects (adversarial_learner.py:95-97).

Usage:
  python tools/exp_convergence_v2.py [cycles] [batch] [pretrain] [f] [H] [W]
      [pwc_ckpt] [state_dir]
Prints IoU of the disambiguated mask vs the square every 25 cycles and a
final verdict line; exits 0 regardless (it is an experiment, not a test).

With state_dir set, the full TrainState plus loop rng/counters are
checkpointed every 250 cycles and the run RESUMES from the latest save —
long runs through the remote-TPU tunnel can die mid-RPC (observed: a
10k-cycle run froze at cycle 3250 when the tunnel dropped), and the
deterministic replay otherwise costs the whole prefix again.

model.best semantics (round 5): whenever the 25-cycle val IoU improves on
the best so far, the full payload is ALSO written to
`<state_dir>/model.best` — the reference's deliverable is that checkpoint,
not the final state (adversarial_learner.py:443-448 saves on best val IoU;
the game destabilizing later costs nothing). Round 4 picked model-2750 by
hand instead; this makes the reference protocol automatic.

Lock-retention lever (round 5, VERDICT item 3): EXP_POSTLOCK_LR=<mult>
multiplies the Adam learning rate by <mult> once the game has LOCKED onto
the object (two consecutive vals with IoU > EXP_LOCK_IOU [0.45] and
mask-cover < EXP_LOCK_COVER [0.12]) — testing whether the post-lock
destabilization (v2 arm: lock at ~1525, collapse at ~4300) is an
exploration-rate artifact. Default 1.0 = reference recipe, no decay; the
scale rides a traced scalar so changing it never recompiles, and it
persists across resumes.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("EXP_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.models import GeneratorNet, RecoverNet
from unsupervised_detection_tpu.ops.losses import charbonnier_loss
from unsupervised_detection_tpu.ops.metrics import compute_all_iou
from unsupervised_detection_tpu.train.learner import TrainState, _clip_or_noise
from unsupervised_detection_tpu.train.objective import AdversarialObjective
from unsupervised_detection_tpu.train.optim import adam_apply, adam_init
from unsupervised_detection_tpu.train.pretrain import random_box_masks
from unsupervised_detection_tpu.utils import enable_compilation_cache


def make_batch_fn(batch: int, H: int, W: int, square: int,
                  with_pairs: bool = False):
    """Jitted ON-DEVICE scene generator (host generation is tunnel-transfer
    bound at ~40 MB/batch on this remote-TPU host — measured 8 s/step).

    Textured scenes: smooth multi-scale background texture, a distinctly
    textured square at a random position, affine background flow + an
    independent affine square flow (magnitudes in reader-pixel units,
    ~[-20, 20] px like DAVIS motion)."""

    def texture(key, scale, amp):
        base = jax.random.uniform(key, (batch, H // scale, W // scale, 3))
        up = jax.image.resize(base, (batch, H, W, 3), "linear")
        return amp * (up - 0.5)

    def make(key):
        ks = jax.random.split(key, 8)
        img_bg = texture(ks[0], 8, 0.6) + texture(ks[1], 2, 0.25)
        sq_tex = texture(ks[2], 4, 0.7) + jax.random.uniform(
            ks[3], (batch, 1, 1, 1), minval=-0.2, maxval=0.2)

        y0 = jax.random.randint(ks[4], (batch, 1, 1), 0, H - square)
        x0 = jax.random.randint(ks[5], (batch, 1, 1), 0, W - square)
        yy = jax.lax.broadcasted_iota(jnp.int32, (batch, H, W), 1)
        xx = jax.lax.broadcasted_iota(jnp.int32, (batch, H, W), 2)
        inside = ((yy >= y0) & (yy < y0 + square)
                  & (xx >= x0) & (xx < x0 + square))
        gt = inside.astype(jnp.float32)[..., None]

        img = jnp.clip(jnp.where(gt > 0, sq_tex, img_bg), -0.5, 0.5)

        # Affine fields a + b*x + c*y per (sample, channel): background coefs
        # in +-(12,16,16), square coefs in +-(20,16,16).
        yn = (yy.astype(jnp.float32) - H / 2) / H
        xn = (xx.astype(jnp.float32) - W / 2) / W
        def affine(key, amp_a):
            co = jax.random.uniform(key, (batch, 2, 3), minval=-1.0, maxval=1.0)
            co = co * jnp.asarray([amp_a, 16.0, 16.0])
            return (co[:, None, None, :, 0]
                    + co[:, None, None, :, 1] * xn[..., None]
                    + co[:, None, None, :, 2] * yn[..., None])

        flow_bg = affine(ks[6], 12.0)
        flow_sq = affine(ks[7], 20.0)
        flow = jnp.where(gt > 0, flow_sq, flow_bg)
        if with_pairs:
            # Second frame by backward warp: I2(p) = I1(p + F(p)) — the
            # convention PWC recovers F under (train/pretrain_pwc.py).
            from unsupervised_detection_tpu.ops.warp import dense_image_warp

            img2 = dense_image_warp(img, -flow)
            return img, img2, flow / 80.0, gt
        return img, flow / 80.0, gt

    return jax.jit(make)


def main():
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    pretrain_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    f = float(sys.argv[4]) if len(sys.argv) > 4 else 0.25
    H = int(sys.argv[5]) if len(sys.argv) > 5 else 192
    W = int(sys.argv[6]) if len(sys.argv) > 6 else 384
    # Optional 7th arg: pwc-scope checkpoint (from pretrain_flow.py). With
    # it, the game consumes flow ESTIMATED by the frozen PWC net on warped
    # frame pairs — the reference's full data path — instead of the
    # ground-truth synthetic field.
    pwc_ckpt = sys.argv[7] if len(sys.argv) > 7 else ""
    state_dir = sys.argv[8] if len(sys.argv) > 8 else ""
    save_every = int(os.environ.get("EXP_SAVE_EVERY", "250"))
    # EXP_SQUARE overrides the object side (default H//4 = 48 at 192x384).
    # Round-4 boundary-limit probe: the locked-regime IoU with estimated
    # flow is hypothesized to be set by the flow-edge smear (a ~4 px ring
    # from the x4 bilinear upsample of the L2 flow grid), predicting
    # IoU ~ ((s-2r)/(s+2r))^2 in the square side s — a sq-96 arm tests it.
    square = int(os.environ.get("EXP_SQUARE", "0")) or max(16, H // 4)
    enable_compilation_cache()
    print(f"config: cycles={cycles} batch={batch} pretrain={pretrain_steps} "
          f"f={f} res={H}x{W} square={square} "
          f"flow={'pwc:' + pwc_ckpt if pwc_ckpt else 'ground-truth'} "
          f"platform={jax.devices()[0].platform}", flush=True)

    # In PWC mode the flow net runs at the working resolution directly
    # (reader == img size; H, W must divide by 2**pyr_lvls — 192x384 does).
    # search_range must match the checkpoint's: exp_pretrain_pwc.py trains
    # at 2 (the range-4 backward overruns the remote AOT compile helper;
    # the cost-volume width changes the first estimator conv's fan-in, so
    # the two are not interchangeable at restore time).
    cfg = Config(img_height=H, img_width=W, batch_size=batch,
                 reader_height=H, reader_width=W,
                 compute_dtype="float32", allow_random_flow=True,
                 pwc_search_range=2 if pwc_ckpt else 4)
    obj = AdversarialObjective(cfg)
    obj.recover = RecoverNet(f=f, dtype=obj.dtype)
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

    def gen_step(state, image, flow, lr_scale):
        rng, r_noise = jax.random.split(state.rng)

        def loss_fn(p):
            out = obj.losses_from_flow(p, state.gen_stats, state.rec_params,
                                       image, flow)
            return out.losses["generator"], out.losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.gen_params)
        grads = _clip_or_noise(r_noise, grads, cfg.gradient_clip,
                               cfg.grad_noise_threshold, True)
        p, o = adam_apply(grads, state.gen_opt, state.gen_params,
                          state.shared_adam_t, hparams[0] * lr_scale,
                          *hparams[1:])
        return state.replace(rng=rng, gen_params=p, gen_opt=o), losses

    def rec_step(state, image, flow, lr_scale):
        rng, r_noise = jax.random.split(state.rng)

        def loss_fn(p):
            out = obj.losses_from_flow(state.gen_params, state.gen_stats, p,
                                       image, flow)
            return out.losses["recover"], out.losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.rec_params)
        grads = _clip_or_noise(r_noise, grads, cfg.gradient_clip,
                               cfg.grad_noise_threshold, False)
        p, o = adam_apply(grads, state.rec_opt, state.rec_params,
                          state.shared_adam_t, hparams[0] * lr_scale,
                          *hparams[1:])
        return state.replace(rng=rng, rec_params=p, rec_opt=o), losses

    def val_fn(state, image, flow, gt):
        mask = obj.generate_mask(state.gen_params, state.gen_stats, image, flow)
        return (compute_all_iou(pred_masks=mask, gt_masks=gt),
                jnp.mean(mask))

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

    gen_step = jax.jit(gen_step, donate_argnums=(0,))
    rec_step = jax.jit(rec_step, donate_argnums=(0,))
    pre_step = jax.jit(pre_step, donate_argnums=(0,))
    val_fn = jax.jit(val_fn)

    pwc_params = None
    if pwc_ckpt:
        from unsupervised_detection_tpu.train import checkpoint as ckpt

        template = jax.jit(obj.pwc.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)))["params"]
        pwc_params = ckpt.restore_checkpoint(pwc_ckpt, template)

        def flow_fn(img1, img2):
            flow = obj.compute_flow(pwc_params, img1, img2)
            return obj.resize_to_working(img1, flow)

        flow_fn = jax.jit(flow_fn)

    make = make_batch_fn(batch, H, W, square, with_pairs=bool(pwc_ckpt))
    val_make = (make if batch == 16
                else make_batch_fn(16, H, W, square, with_pairs=bool(pwc_ckpt)))

    def next_batch(key, maker):
        """(image, flow, gt) — flow either ground truth or PWC-estimated."""
        if pwc_ckpt:
            img1, img2, _, gt = maker(key)
            image, flow = flow_fn(img1, img2)
            return image, flow, gt
        img, flow, gt = maker(key)
        return img, flow, gt

    from unsupervised_detection_tpu.train import checkpoint as ckptmod

    # best starts below any reachable IoU so the FIRST val always writes
    # model.best (the e2e chain needs a best checkpoint to exist even if
    # the game never lifts off); resumes restore the stored value.
    start_cycle, best = 1, -1.0
    lr_scale = 1.0
    postlock_lr = float(os.environ.get("EXP_POSTLOCK_LR", "1.0"))
    lock_iou = float(os.environ.get("EXP_LOCK_IOU", "0.45"))
    lock_cover = float(os.environ.get("EXP_LOCK_COVER", "0.12"))
    locked_votes = 0
    data_key = jax.random.PRNGKey(1234)
    resume_path = None
    if state_dir:
        os.makedirs(state_dir, exist_ok=True)
        resume_path = ckptmod.latest_checkpoint(state_dir)
    if resume_path:
        payload = {"state": state, "data_key": data_key,
                   "cycle": np.int32(0), "best": np.float32(0.0),
                   "lr_scale": np.float32(1.0)}
        try:
            payload = ckptmod.restore_checkpoint(resume_path, payload)
            lr_scale = float(payload["lr_scale"])
        except Exception:
            # Pre-round-5 saves lack the lr_scale leaf.
            payload.pop("lr_scale")
            payload = ckptmod.restore_checkpoint(resume_path, payload)
        state, data_key = payload["state"], payload["data_key"]
        start_cycle = int(payload["cycle"]) + 1
        best = float(payload["best"])
        pretrain_steps = 0  # recover warm start is inside the saved state
        print(f"resumed from {resume_path} at cycle {start_cycle} "
              f"(best {best:.3f}, lr_scale {lr_scale:g})", flush=True)

    prng = jax.random.PRNGKey(7)
    t0 = time.time()
    for i in range(1, pretrain_steps + 1):
        data_key, k = jax.random.split(data_key)
        img, flow, _ = next_batch(k, make)
        prng, r_mask = jax.random.split(prng)
        state, ploss = pre_step(state, img, flow, r_mask)
        if i % 100 == 0:
            print(f"pretrain {i:5d}  inpaint loss {float(ploss):.4f}  "
                  f"({time.time()-t0:.0f}s)", flush=True)
    if not resume_path:
        state = state.replace(rec_opt=adam_init(state.rec_params))

    val_img, val_flow, val_gt = next_batch(jax.random.PRNGKey(999), val_make)
    if pwc_ckpt:
        # Diagnostic: how good is the frozen flow the game consumes? EPE of
        # the PWC estimate vs the synthetic ground truth on the val batch
        # (both in reader-pixel units; val_flow is /flow_normalizer).
        _, _, gt80, _ = val_make(jax.random.PRNGKey(999))
        epe = float(jnp.mean(jnp.linalg.norm(
            (val_flow - gt80) * cfg.flow_normalizer, axis=-1)))
        print(f"frozen-PWC flow quality on val batch: EPE {epe:.2f} px",
              flush=True)
    sub = 0
    cyc = cfg.iters_rec + cfg.iters_gen
    hist = []
    def payload_of(cycle):
        return {"state": state, "data_key": data_key,
                "cycle": np.int32(cycle), "best": np.float32(best),
                "lr_scale": np.float32(lr_scale)}

    for cycle in range(start_cycle, cycles + 1):
        for _ in range(cyc):
            data_key, k = jax.random.split(data_key)
            img, flow, _ = next_batch(k, make)
            step = rec_step if (sub % cyc) < cfg.iters_rec else gen_step
            state, losses = step(state, img, flow, jnp.float32(lr_scale))
            sub += 1
        if cycle % 25 == 0 or cycle == 1:
            ious, mcov = val_fn(state, val_img, val_flow, val_gt)
            iou, mcov = float(jnp.mean(ious)), float(mcov)
            if iou > best:
                best = iou
                if state_dir:
                    # Reference protocol: the deliverable is the best-val
                    # checkpoint, not the final state
                    # (adversarial_learner.py:443-448).
                    ckptmod.save_checkpoint(state_dir, "model.best",
                                            payload_of(cycle))
            hist.append((cycle, iou))
            print(f"cycle {cycle:5d}  IoU {iou:.3f}  "
                  f"mask-cover {mcov:.2f}  "
                  f"gen {float(losses['generator']):+.4f}  "
                  f"rec {float(losses['recover']):.4f}  "
                  f"({time.time()-t0:.0f}s)", flush=True)
            if postlock_lr != 1.0 and lr_scale == 1.0:
                locked_votes = (locked_votes + 1
                                if iou > lock_iou and mcov < lock_cover
                                else 0)
                if locked_votes >= 2:
                    lr_scale = postlock_lr
                    print(f"cycle {cycle:5d}  LOCK detected (2 consecutive "
                          f"vals IoU > {lock_iou}, cover < {lock_cover}) — "
                          f"lr scaled x{postlock_lr:g}", flush=True)
        if state_dir and cycle % save_every == 0:
            ckptmod.save_checkpoint(state_dir, f"model-{cycle}",
                                    payload_of(cycle))
    ious, _ = val_fn(state, val_img, val_flow, val_gt)
    hist.append((cycles, float(jnp.mean(ious))))
    tail = [i for _, i in hist[-8:]]
    print(f"final: best IoU {best:.3f}; last-8 mean {np.mean(tail):.3f}; "
          f"{'CONVERGED (sustained IoU > 0.5)' if np.mean(tail) > 0.5 else 'did not lock on'}",
          flush=True)


if __name__ == "__main__":
    main()
