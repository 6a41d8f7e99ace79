"""High-level training orchestration (the reference's train() loop).

Mirrors models/adversarial_learner.py:312-448: restore logic (mandatory flow
checkpoint, optional recover warm start, resume), the 1:3 recover/generator
alternation, per-summary_freq console+TensorBoard logging, per-epoch
validation IoU, best-model and periodic checkpointing, and the
num_samples_train-defined epoch length. Device work is fully jitted; the
loop only moves batches and bookkeeping.
"""

from __future__ import annotations

import math
import os
import time
from typing import Optional

import jax
import numpy as np

from ..config import Config
from ..data import TestPipeline, TrainPipeline, get_reader
from ..utils.profiling import StepTimer
from . import checkpoint as ckpt
from .learner import AdversarialLearner


def _writer(logdir):
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(logdir)
    except Exception:
        return None


def train(config: Config, max_cycles: Optional[int] = None, verbose: bool = True):
    """Run adversarial training; returns the final TrainState.

    Args:
        config: full configuration.
        max_cycles: optional hard cap on alternation cycles (testing hook).
    """
    if not config.flow_ckpt and not config.allow_random_flow:
        # Hard error like the reference (adversarial_learner.py:339-343):
        # training against a randomly-initialized flow net silently produces
        # garbage. --allow_random_flow is the explicit synthetic/test escape.
        raise SystemExit(
            "No checkpoint for the flow network provided (--flow_ckpt). "
            "Pass --allow_random_flow to train against a randomly "
            "initialized PWC net anyway (synthetic/test runs only)."
        )
    np.random.seed(config.seed)
    if config.debug_nans:
        # NaN guard (SURVEY.md 5.2): fail fast inside jitted steps.
        jax.config.update("jax_debug_nans", True)

    reader = get_reader(config.dataset, config.root_dir,
                        max_temporal_len=config.max_temporal_len,
                        min_temporal_len=config.min_temporal_len,
                        num_threads=config.num_threads)
    train_ds = reader.dataset(config.train_partition)
    raw_hw = (
        (reader.raw_height, reader.raw_width) if reader.raw_height is not None else None
    )
    train_pipe = TrainPipeline(
        train_ds, config.batch_size, config.min_temporal_len, config.max_temporal_len,
        reader_hw=(config.reader_height, config.reader_width),
        raw_hw=raw_hw, num_threads=config.num_threads, seed=config.seed,
    )
    val_partition = "val" if config.dataset != "SEGTRACK" else "all"
    val_ds = reader.dataset(val_partition)
    val_pipe = TestPipeline(
        val_ds, config.batch_size, config.test_temporal_shift,
        reader_hw=(config.reader_height, config.reader_width),
        raw_hw=raw_hw, num_threads=config.num_threads,
    )

    learner = AdversarialLearner(config)
    state = learner.init_state(jax.random.PRNGKey(config.seed))

    n_params = sum(
        int(np.prod(p.shape))
        for p in jax.tree.leaves(
            (state.gen_params, state.rec_params, state.pwc_params)
        )
    )
    if verbose:
        print("Number of params: {}".format(n_params))

    # --- restore logic (adversarial_learner.py:339-360) -------------------
    if config.flow_ckpt:
        state = _restore_scope(config.flow_ckpt, state, "pwc")
        if verbose:
            print("Flow net loaded from {}".format(config.flow_ckpt))
    elif verbose:
        print("WARNING: --allow_random_flow set; PWC flow net is randomly "
              "initialized")

    if config.resume_train:
        path = None
        if ckpt.checkpoint_exists(config.full_model_ckpt):
            path = config.full_model_ckpt
        elif os.path.isdir(config.checkpoint_dir):
            path = ckpt.latest_checkpoint(config.checkpoint_dir)
        assert path, "Found no checkpoint to resume training!"
        state = ckpt.restore_checkpoint(path, state)
        if verbose:
            print("Resumed training from model {}".format(path))
    elif ckpt.checkpoint_exists(config.recover_ckpt):
        state = _restore_scope(config.recover_ckpt, state, "recover")
        if verbose:
            print("Recover net loaded from previous ckpt")
    elif verbose:
        print("No recover checkpoint found! Train Recover from Scratch")

    writer = _writer(config.checkpoint_dir) if config.checkpoint_dir else None
    steps_per_epoch = int(math.ceil(config.num_samples_train / config.batch_size))
    val_steps = val_pipe.num_steps
    sum_iters = config.iters_rec + config.iters_gen
    min_val_iou = -1.0e12

    if verbose:
        print("-------------------------------------")
        print("Training {} Recover and {} Generator".format(
            config.iters_rec, config.iters_gen))
        print("-------------------------------------")

    train_iter = iter(train_pipe)
    timer = StepTimer(config.batch_size)

    sub_step = 0
    while True:
        sub_step += 1
        batch = next(train_iter)
        img1, img2 = learner.feeder.images(batch)
        start_time = time.time()

        is_gen = learner.select_step(sub_step) is learner.generator_step
        state, losses, grads = learner.select_step(sub_step)(state, img1, img2)
        if sub_step % sum_iters == 0:
            state = learner.incr_step(state)
        timer.tick()

        if sub_step % config.summary_freq == 0:
            loss_gen = float(losses["generator"])  # syncs the step
            loss_rec = float(losses["recover"])
            epoch = math.ceil(sub_step / steps_per_epoch)
            epoch_step = sub_step - (epoch - 1) * steps_per_epoch
            if verbose:
                print(
                    "Epoch: [%2d] [%5d/%5d] time: %4.4f/it (%.1f samples/s) "
                    "loss_generator: %4.4f loss_recover %4.4f"
                    % (epoch, epoch_step, steps_per_epoch,
                       time.time() - start_time, timer.frames_per_second,
                       loss_gen, loss_rec)
                )
            if writer:
                gs = int(state.step)
                for key, value in losses.items():
                    writer.add_scalar(key, float(value), gs)
                writer.add_scalar("samples_per_sec", timer.frames_per_second, gs)
                # Per-variable gradient histograms, like the reference's
                # collect_summaries (adversarial_learner.py:283-290). `grads`
                # are the post-clip/noise values of whichever net this
                # sub-step trained.
                net = "MaskNet" if is_gen else "FlownetS"
                for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
                    name = "/".join(
                        getattr(k, "key", str(k)) for k in path
                    )
                    writer.add_histogram(
                        f"{net}/{name}/gradients", np.asarray(leaf), gs
                    )
                images = learner.summary_images(state, img1, img2)
                for key, img in images.items():
                    arr = np.clip(np.asarray(img)[0] + 0.5, 0.0, 1.0)
                    writer.add_image(key, arr, gs, dataformats="HWC")

        if sub_step % steps_per_epoch == 0:
            epoch = sub_step // steps_per_epoch
            val_iou = _run_validation(learner, state, val_pipe, val_steps)
            val_iou /= val_steps * config.batch_size
            if verbose:
                print("Epoch [{}] Validation IoU: {}".format(epoch, val_iou))
            if writer:
                writer.add_scalar("IoU_on_Validation", val_iou, epoch)
            if config.checkpoint_dir:
                if val_iou > min_val_iou:
                    ckpt.save_best(config.checkpoint_dir, state)
                    min_val_iou = val_iou
                if epoch % config.save_freq == 0:
                    ckpt.save_epoch(config.checkpoint_dir, epoch, state)
            if epoch == config.max_epochs:
                if verbose:
                    print("-------------------------------")
                    print("Training completed successfully")
                    print("-------------------------------")
                break

        if max_cycles is not None and sub_step >= max_cycles * sum_iters:
            break

    if writer:
        writer.close()
    return state


def _run_validation(learner, state, val_pipe, val_steps):
    total = 0.0
    for step, batch in enumerate(val_pipe):
        if step >= val_steps:
            break
        img1, img2 = learner.feeder.images(batch)
        gt = learner.feeder.mask(batch)
        total += float(learner.val_step(state, img1, img2, gt))
    return total


def _restore_scope(path: str, state, scope: str):
    """Restore one network's parameters from a checkpoint directory that may
    hold either a full TrainState or a bare scope save."""
    from . import tf1_import

    if tf1_import.is_tf_checkpoint(path):
        return tf1_import.restore_tf1_scope(path, state, scope)
    attr = {"pwc": "pwc_params", "recover": "rec_params", "gen": "gen_params"}[scope]
    template = getattr(state, attr)
    return state.replace(**{attr: ckpt.restore_params_scope(path, template, attr)})
