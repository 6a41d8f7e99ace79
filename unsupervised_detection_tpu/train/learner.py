"""Adversarial learner: train state, jitted two-player steps, validation.

TPU-native redesign of the reference AdversarialLearner
(models/adversarial_learner.py:206-448):

  * one pytree TrainState {generator, recover, frozen PWC, two Adam states,
    step, rng} instead of scope-filtered tf.Variables; Adam is the TF1
    formulation with the reference's shared bias-correction step
    (train/optim.py);
  * two jitted step functions (recover / generator) sharing the forward
    construction; each compiles once and is driven by the reference's
    1:3 alternation schedule from Python;
  * augmentation (flip + random crop) runs inside the compiled step on
    device with a threaded PRNG;
  * per-element gradient clipping to +-clip and the generator's
    vanishing-gradient noise injection (loss_utils.py:12-32) as pure jnp;
  * data parallelism: batches arrive sharded along the mesh "data" axis and
    parameters replicated; the batch-mean losses make jax.grad emit ICI
    all-reduces automatically.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..config import Config
from ..ops.augment import augment_pair
from ..ops.resize import central_crop_resize
from ..parallel.mesh import data_sharding, make_mesh, replicate, shard_batch
from .objective import AdversarialObjective
from .optim import AdamState, adam_apply, adam_init


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray            # completed alternation cycles (global_step)
    rng: jnp.ndarray
    gen_params: Any
    gen_stats: Any
    rec_params: Any
    pwc_params: Any
    gen_opt: AdamState
    rec_opt: AdamState

    @property
    def shared_adam_t(self):
        """The reference's shared Adam bias-correction step for the NEXT
        apply: its single AdamOptimizer instance decays the beta-power
        accumulators on every apply_gradients of either net
        (train/optim.py module docstring)."""
        return self.gen_opt.count + self.rec_opt.count + 1


def _clip_or_noise(rng, grads, clip_value, noise_threshold, can_change):
    """Per-element clip, with the generator's noise-injection escape hatch.

    If the mean over variables of mean|grad| drops below `noise_threshold`
    (the all-mask/no-mask local minimum), every gradient is replaced by
    |U(-clip, clip)| noise (loss_utils.py:7-26)."""
    leaves = jax.tree.leaves(grads)
    clipped = jax.tree.map(lambda g: jnp.clip(g, -clip_value, clip_value), grads)
    if not can_change:
        return clipped
    grad_avg = jnp.mean(jnp.stack([jnp.mean(jnp.abs(g)) for g in leaves]))
    should_change = grad_avg < noise_threshold
    treedef = jax.tree.structure(grads)
    keys = jax.tree.unflatten(treedef, list(jax.random.split(rng, len(leaves))))
    noised = jax.tree.map(
        lambda g, k: jnp.abs(jax.random.uniform(k, g.shape, g.dtype, -clip_value, clip_value)),
        grads, keys,
    )
    return jax.tree.map(
        lambda n, c: jnp.where(should_change, n, c), noised, clipped
    )


class AdversarialLearner:
    """Owns the objective, optimizers, mesh, and compiled step functions."""

    def __init__(self, config: Config, mesh=None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(
            n_data=config.mesh_data or None, n_model=config.mesh_model,
            batch_size=config.batch_size,
        )
        self.objective = AdversarialObjective(config, mesh=self.mesh)
        # (lr, b1, b2, eps) for train/optim.adam_apply — TF1-Adam semantics
        # with the shared step (adversarial_learner.py:216-233).
        self.adam_hparams = (
            config.learning_rate, config.beta1, 0.999, config.adam_epsilon,
        )
        self._build_steps()

    # --- state ------------------------------------------------------------
    def init_state(self, rng) -> TrainState:
        cfg = self.config
        r_gen, r_rec, r_pwc, r_state = jax.random.split(rng, 4)
        img_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 3), jnp.float32)
        flow_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 2), jnp.float32)
        mask_w = jnp.zeros((1, cfg.img_height, cfg.img_width, 1), jnp.float32)
        img_r = jnp.zeros((1, cfg.reader_height, cfg.reader_width, 3), jnp.float32)

        gen_vars = self.objective.generator.init(r_gen, img_w, flow_w)
        rec_vars = self.objective.recover.init(r_rec, img_w, flow_w, mask_w)
        pwc_vars = self.objective.pwc.init(r_pwc, img_r, img_r)

        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            rng=r_state,
            gen_params=gen_vars["params"],
            gen_stats=gen_vars["batch_stats"],
            rec_params=rec_vars["params"],
            pwc_params=pwc_vars["params"],
            gen_opt=adam_init(gen_vars["params"]),
            rec_opt=adam_init(rec_vars["params"]),
        )
        # Replicate across the mesh so jit sees consistent shardings.
        return jax.device_put(state, replicate(self.mesh))

    # --- compiled steps -----------------------------------------------------
    def _build_steps(self):
        cfg = self.config
        obj = self.objective

        def augmented_forward_loss(gen_params, rec_params, state, img1, img2, rng):
            img1, img2 = augment_pair(rng, img1, img2, cfg.train_crop)
            out = obj.forward(
                gen_params, state.gen_stats, rec_params, state.pwc_params, img1, img2
            )
            return out

        def generator_step(state: TrainState, img1, img2):
            rng, r_aug, r_noise = jax.random.split(state.rng, 3)

            def loss_fn(gen_params):
                out = augmented_forward_loss(
                    gen_params, state.rec_params, state, img1, img2, r_aug
                )
                return out.losses["generator"], out.losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(state.gen_params)
            grads = _clip_or_noise(
                r_noise, grads, cfg.gradient_clip, cfg.grad_noise_threshold, True
            )
            t = state.shared_adam_t if cfg.adam_shared_step else state.gen_opt.count + 1
            gen_params, gen_opt = adam_apply(
                grads, state.gen_opt, state.gen_params, t, *self.adam_hparams
            )
            new_state = state.replace(rng=rng, gen_params=gen_params, gen_opt=gen_opt)
            # The post-clip/noise grads are returned for summary histograms
            # (reference logs clipped_grad_and_vars, adversarial_learner.py:283-290);
            # they stay on device unless the host fetches them.
            return new_state, losses, grads

        def recover_step(state: TrainState, img1, img2):
            rng, r_aug, r_noise = jax.random.split(state.rng, 3)

            def loss_fn(rec_params):
                out = augmented_forward_loss(
                    state.gen_params, rec_params, state, img1, img2, r_aug
                )
                return out.losses["recover"], out.losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(state.rec_params)
            grads = _clip_or_noise(
                r_noise, grads, cfg.gradient_clip, cfg.grad_noise_threshold, False
            )
            t = state.shared_adam_t if cfg.adam_shared_step else state.rec_opt.count + 1
            rec_params, rec_opt = adam_apply(
                grads, state.rec_opt, state.rec_params, t, *self.adam_hparams
            )
            new_state = state.replace(rng=rng, rec_params=rec_params, rec_opt=rec_opt)
            return new_state, losses, grads

        def incr_step(state: TrainState):
            return state.replace(step=state.step + 1)

        def val_step(state: TrainState, img1, img2, gt_masks):
            if cfg.test_crop != 1.0:
                img1 = central_crop_resize(img1, cfg.test_crop)
                img2 = central_crop_resize(img2, cfg.test_crop)
                gt_masks = central_crop_resize(gt_masks, cfg.test_crop)
            iou = obj.validation_iou(
                state.gen_params, state.gen_stats, state.pwc_params, img1, img2, gt_masks
            )
            return jnp.sum(iou)

        batch_shard = data_sharding(self.mesh)
        repl = replicate(self.mesh)
        state_in = (repl, batch_shard, batch_shard)

        self.generator_step = jax.jit(
            generator_step, in_shardings=state_in,
            out_shardings=(repl, repl, repl), donate_argnums=(0,),
        )
        self.recover_step = jax.jit(
            recover_step, in_shardings=state_in,
            out_shardings=(repl, repl, repl), donate_argnums=(0,),
        )
        self.incr_step = jax.jit(incr_step, donate_argnums=(0,))
        self.val_step = jax.jit(
            val_step,
            in_shardings=(repl, batch_shard, batch_shard, batch_shard),
            out_shardings=repl,
        )

        def summary_images(state: TrainState, img1, img2):
            """Image summaries of one batch (reference collect_summaries,
            adversarial_learner.py:260-281): inputs, Middlebury-colorized PWC
            flow, masked flow, recovered flow and its complement. Uses the
            first batch element only; fully on device."""
            from ..ops.flow import flow_to_image_summary
            from ..ops.metrics import disambiguate_forward_background
            from ..ops.resize import resize_bilinear

            out = obj.forward(
                state.gen_params, state.gen_stats, state.rec_params,
                state.pwc_params, img1, img2,
            )
            first = lambda x: x[0:1]
            pwc_viz = flow_to_image_summary(first(out.flow))
            fg = disambiguate_forward_background(first(out.mask))
            return {
                "input_image": first(out.image),
                "next_image": first(resize_bilinear(img2, (cfg.img_height, cfg.img_width))),
                "masked_flow": pwc_viz * (1.0 - fg),
                "PWC_Flow": pwc_viz,
                "Rec_flow": flow_to_image_summary(first(out.pred_flow)),
                "Rec_flow_compl": flow_to_image_summary(first(out.pred_flow_compl)),
            }

        self.summary_images = jax.jit(
            summary_images, in_shardings=(repl, batch_shard, batch_shard),
        )

        from ..data.device_input import DeviceFeeder

        self.feeder = DeviceFeeder(self.mesh, (cfg.reader_height, cfg.reader_width))

    # --- schedule -----------------------------------------------------------
    def select_step(self, sub_step: int):
        """The reference alternation (adversarial_learner.py:386-389):
        sub-steps with (step % (iters_rec+iters_gen)) < iters_rec train the
        recover, the rest the generator; `sub_step` starts at 1."""
        cfg = self.config
        cycle = cfg.iters_rec + cfg.iters_gen
        if (sub_step % cycle) < cfg.iters_rec:
            return self.recover_step
        return self.generator_step

    def shard(self, batch):
        return shard_batch(self.mesh, batch)
