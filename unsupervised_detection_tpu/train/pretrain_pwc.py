"""PWC flow-network pretraining on synthetic warped scenes.

The reference pipeline REQUIRES a pretrained PWC checkpoint and hard-aborts
without one (adversarial_learner.py:339-343); it ships no code to produce
one (the published ckpt comes from the external tfoptflow project). This
module closes that gap TPU-natively: FlyingChairs-style supervised training
on procedurally generated scenes — textured images warped by known smooth
flow fields — so the framework can bootstrap its own flow network from
scratch in environments with no external checkpoints or datasets.

Data construction: given a textured frame I1 and a smooth flow field F
(affine + low-frequency sinusoid, in (dy, dx) channel order matching
ops/warp.dense_image_warp), the second frame is I2 = warp(I1, -F), i.e.
I2(p) = I1(p + F(p)); the flow PWC should report for (I1, I2) is then F
(the net warps its second feature pyramid by its flow estimate to align
with the first, ops/warp.py semantics).

Loss: end-point error on the final full-resolution output plus auxiliary
EPE on each pyramid level against resize(F)/2**flow_pred_lvl — the target
implied by the model's own output convention (the final x4 upsample
multiplies magnitudes by 4, models/pwcnet.py; flow magnitudes are never
rescaled by resizes in this framework, adversarial_learner.py:89-90).

Optimizer note: optax.adam — like train/pretrain.py, there is no reference
numerics contract for a stage the reference doesn't implement (the
TF1-exact Adam in train/optim.py exists for the golden-tested adversarial
stage).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..ops.resize import resize_bilinear
from ..ops.warp import dense_image_warp
from .objective import AdversarialObjective


def synthetic_flow_batch(rng: np.random.RandomState, batch: int, height: int,
                         width: int, max_mag: float = 12.0):
    """(img1, img2, flow) with I2(p) = I1(p + F(p)) and smooth random F.

    Images are multi-scale random textures in [-0.5, 0.5]; F is an affine
    field plus a low-frequency sinusoidal perturbation, clipped to
    +-max_mag pixels. All arrays float32; flow channel order (dy, dx)."""
    def texture(scale, amp):
        base = rng.rand(batch, height // scale, width // scale, 3).astype(np.float32)
        up = jax.image.resize(jnp.asarray(base), (batch, height, width, 3), "linear")
        return amp * (np.asarray(up) - 0.5)

    img1 = np.clip(texture(8, 0.7) + texture(2, 0.3), -0.5, 0.5).astype(np.float32)

    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    yn, xn = (yy - height / 2) / height, (xx - width / 2) / width
    flow = np.zeros((batch, height, width, 2), np.float32)
    for b in range(batch):
        for ch in range(2):
            a = rng.uniform(-0.5, 0.5) * max_mag
            lin = rng.uniform(-0.5, 0.5, 2) * max_mag
            amp = rng.uniform(-0.3, 0.3) * max_mag
            fy, fx = rng.uniform(1.0, 3.0, 2)
            ph = rng.uniform(0, 2 * np.pi, 2)
            flow[b, :, :, ch] = (
                a + lin[0] * yn + lin[1] * xn
                + amp * np.sin(2 * np.pi * fy * yn + ph[0])
                * np.cos(2 * np.pi * fx * xn + ph[1])
            )
    flow = np.clip(flow, -max_mag, max_mag)
    img2 = np.asarray(dense_image_warp(jnp.asarray(img1), jnp.asarray(-flow)))
    return img1, img2, flow


def boundary_band(mask, radius: int = 4):
    """Morphological boundary band of a {0,1} mask: dilate(m) - erode(m).

    [B,H,W,1] float in/out; a pixel is in the band iff both classes occur
    within `radius` (Chebyshev). Used to upweight the flow-discontinuity
    ring in pretraining: the PWC output is an x4 bilinear upsample of the
    L2 flow grid (models/pwcnet.py, reference model_pwcnet.py:642-647),
    so the edge transition is ~4 px wide and band-averaged EPE — not mean
    EPE — is what bounds the adversarial game's mask boundary precision
    (ROADMAP round-4 item 3: locked-regime IoU tracks boundary EPE)."""
    k = 2 * radius + 1
    dil = jax.lax.reduce_window(mask, -jnp.inf, jax.lax.max,
                                (1, k, k, 1), (1, 1, 1, 1), "SAME")
    ero = -jax.lax.reduce_window(-mask, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, 1, 1, 1), "SAME")
    return dil - ero


def multiscale_epe(flow_pred, flow_pyr, flow_gt, flow_pred_lvl: int = 2,
                   aux_weight: float = 0.1, weight=None, weight_aux=None):
    """Final-resolution EPE + auxiliary per-level EPE.

    Pyramid levels are coarse->fine (models/pwcnet.py return_pyramid).
    Per-level targets follow the scales the architecture itself implies
    (model_pwcnet.py:616,642-647 — flow magnitudes are never rescaled by
    resizes in this framework):
      * levels above flow_pred_lvl: resize(F) / 20 — with the 20/2**lvl
        warp scaler, an upsampled F/20 flow displaces features by exactly
        the true level-l pixel motion F/2**lvl;
      * the output level: resize(F) / 2**flow_pred_lvl — the final x4
        upsample multiplies magnitudes by 2**flow_pred_lvl, so this target
        makes the full-resolution output equal F in reader pixels.

    `weight` ([B,H,W,1], optional) reweights pixels in the LOSS at every
    level (normalized so the mean weight is 1) — used to upweight moving
    objects, whose few pixels a uniform mean otherwise optimizes away
    (round-4 diagnosis: 0.36 px background vs 16 px inside-object EPE).
    `weight_aux` (optional) replaces `weight` for the auxiliary pyramid
    levels only: the round-5 v3 post-mortem showed that a weight
    concentrated on motion-boundary pixels must NOT be resized onto
    coarse levels — there the resize-blurred targets are bilinear
    mixtures of two motions no flow field can match, and their
    high-variance residuals (amplified 8x) swamp Adam's second moments
    through the shared convs, flattening ALL learning (12k-step v3 run:
    even background EPE never moved; ablation C without the band weight
    learned normally). The returned `epe` metric stays unweighted."""
    err = jnp.linalg.norm(flow_pred - flow_gt, axis=-1)
    epe = jnp.mean(err)

    def wmean(e, w):
        if w is None:
            return jnp.mean(e)
        w = w[..., 0]
        return jnp.sum(e * w) / jnp.maximum(jnp.sum(w), 1e-6)

    loss = wmean(err, weight)
    aux = 0.0
    w_base = weight if weight_aux is None else weight_aux
    for i, flow_l in enumerate(flow_pyr):
        size = (flow_l.shape[1], flow_l.shape[2])
        scale = (2.0**flow_pred_lvl if i == len(flow_pyr) - 1 else 20.0)
        target = resize_bilinear(flow_gt, size) / scale
        w_l = None if w_base is None else resize_bilinear(w_base, size)
        aux = aux + wmean(jnp.linalg.norm(
            flow_l.astype(jnp.float32) - target, axis=-1), w_l)
    return loss + aux_weight * aux, epe


def pretrain_pwc(config: Config, steps: int, verbose: bool = True,
                 batch_fn=None, learning_rate: Optional[float] = None,
                 params=None, save_every: int = 1000,
                 lr_schedule: str = "constant",
                 object_weight: float = 0.0,
                 boundary_weight: float = 0.0,
                 boundary_mode: str = "final") -> Tuple[dict, float]:
    """Train the PWC net on synthetic warped scenes; returns (params, EPE).

    `batch_fn(rng, batch, H, W) -> (img1, img2, flow)` overrides the scene
    generator (tests use tiny fields); EPE returned is the final-step
    training EPE in reader pixels. With config.checkpoint_dir set, bare
    pwc-scope checkpoints are written, consumable by train.py --flow_ckpt
    (train/driver._restore_scope). lr_schedule="cosine" decays the rate to
    5% of peak over `steps` after a 200-step linear warmup (constant, the
    default, reproduces earlier runs exactly).

    `batch_fn` may also return a 4th element — an object mask [B,H,W,1] —
    in which case the loss upweights object pixels by `object_weight`
    (per-pixel weight 1 + object_weight*mask, multiscale_epe) and the
    progress line reports EPE split by region (inside objects vs
    background), the metric that actually gates the adversarial game
    (tools/exp_flow_diag.py). `boundary_weight` additionally upweights
    the +-4 px ring around object edges (boundary_band) in the FINAL
    full-resolution loss term ONLY — the boundary-EPE lever. Recipe v3
    applied it at every pyramid level and learned nothing for 12k steps
    (coarse-level band targets are unmatchable resize blurs; see
    multiscale_epe); as of round 5 the aux levels always use the object
    weight alone. With it set, the progress line also reports band EPE.
    boundary_mode="all" reproduces the v3 all-levels behavior (kept ONLY
    so the failure is reproducible/testable)."""
    if boundary_mode not in ("final", "all"):
        raise ValueError(f"Unknown boundary_mode: {boundary_mode!r}")
    obj = AdversarialObjective(config)
    lr = learning_rate if learning_rate is not None else config.learning_rate
    if lr_schedule == "cosine":
        warmup = min(200, max(1, steps // 10))
        lr = optax.warmup_cosine_decay_schedule(
            init_value=lr / 10, peak_value=lr, warmup_steps=warmup,
            decay_steps=steps, end_value=lr * 0.05)
    elif lr_schedule != "constant":
        raise ValueError(f"Unknown lr_schedule: {lr_schedule!r}")
    optimizer = optax.adam(lr, b1=config.beta1, eps=config.adam_epsilon)
    h, w = config.reader_height, config.reader_width

    rng = jax.random.PRNGKey(config.seed)
    if params is None:
        img_r = jnp.zeros((1, h, w, 3), jnp.float32)
        # jit the init: eager flax init dispatches op-by-op, which is
        # minutes of round-trips on a remote-tunneled TPU backend.
        params = jax.jit(obj.pwc.init)(rng, img_r, img_r)["params"]
    opt_state = optimizer.init(params)

    def step(params, opt_state, img1, img2, flow_gt, obj_mask):
        def loss_fn(p):
            flow_pred, flow_pyr = obj.pwc.apply(
                {"params": p}, img1, img2, return_pyramid=True)
            weight, weight_aux, band = None, None, None
            if obj_mask is not None:
                weight = 1.0 + object_weight * obj_mask
                if boundary_weight:
                    # Band upweight at the FINAL level only — resized onto
                    # the aux pyramid levels it is a training killer (the
                    # recipe-v3 failure; see multiscale_epe docstring).
                    band = boundary_band(obj_mask)
                    if boundary_mode == "final":
                        weight_aux = weight
                    weight = weight + boundary_weight * band
            loss, epe = multiscale_epe(flow_pred, flow_pyr, flow_gt,
                                       obj.pwc.flow_pred_lvl, weight=weight,
                                       weight_aux=weight_aux)
            regions = ()
            if obj_mask is not None:
                err = jnp.linalg.norm(flow_pred - flow_gt, axis=-1,
                                      keepdims=True)

                def rmean(m):
                    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)

                regions = (rmean(obj_mask), rmean(1 - obj_mask))
                if band is not None:
                    regions = regions + (rmean(band),)
            return loss, (epe, regions)

        (loss, (epe, regions)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, loss, epe,
                regions)

    step = jax.jit(step, donate_argnums=(0, 1), static_argnames=())
    make = batch_fn or synthetic_flow_batch
    nprng = np.random.RandomState(config.seed)
    epe = float("nan")
    for i in range(1, steps + 1):
        out = make(nprng, config.batch_size, h, w)
        img1, img2, flow = out[:3]
        obj_mask = out[3] if len(out) > 3 else None
        params, opt_state, loss, epe, regions = step(
            params, opt_state, img1, img2, flow, obj_mask)
        if verbose and (i % 50 == 0 or i == 1):
            extra = ""
            if regions:
                extra = (f"  inside {float(regions[0]):.3f}"
                         f"  bg {float(regions[1]):.3f}")
                if len(regions) > 2:
                    extra += f"  band {float(regions[2]):.3f}"
            print(f"pwc-pretrain {i:6d}  loss {float(loss):.4f}  "
                  f"EPE {float(epe):.4f} px{extra}", flush=True)
        if config.checkpoint_dir and i % save_every == 0:
            from . import checkpoint as ckpt

            ckpt.save_checkpoint(config.checkpoint_dir, f"pwc-{i}", params)
    if config.checkpoint_dir:
        from . import checkpoint as ckpt

        ckpt.save_checkpoint(config.checkpoint_dir, "pwc-final", params)
    return params, float(epe)
