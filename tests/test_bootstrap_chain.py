"""From-scratch bootstrap chain: pretrain_flow -> pretrain_recover -> train.

The reference pipeline cannot start without two externally downloaded
checkpoints (adversarial_learner.py:339-343 aborts; README points at
tfoptflow + FlyingChairs artifacts). This framework produces both stages
itself; scripts/bootstrap_from_scratch.sh chains the CLIs with exactly the
checkpoint-path contract exercised here in-process.
"""

import os

import numpy as np
import pytest

import jax

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train import checkpoint as ckpt
from unsupervised_detection_tpu.train.driver import train
from unsupervised_detection_tpu.train.pretrain import pretrain_recover
from unsupervised_detection_tpu.train.pretrain_pwc import pretrain_pwc

from synthetic import make_moving_square_davis


def test_bootstrap_chain(tmp_path):
    root = make_moving_square_davis(str(tmp_path / "davis"), frames=10,
                                    hw=(128, 192))
    common = dict(img_height=32, img_width=64,
                  reader_height=64, reader_width=128,
                  batch_size=8, num_threads=2)

    # Stage 1: PWC pretraining on synthetic warped scenes -> pwc/pwc-final.
    pwc_dir = str(tmp_path / "pwc")
    os.makedirs(pwc_dir)
    pretrain_pwc(Config(checkpoint_dir=pwc_dir, seed=1, **common),
                 steps=2, verbose=False)
    pwc_ckpt = os.path.join(pwc_dir, "pwc-final")
    assert ckpt.checkpoint_exists(pwc_ckpt)

    # Stage 2: recover inpainting with stage 1's flow -> recover/recover-final.
    rec_dir = str(tmp_path / "recover")
    os.makedirs(rec_dir)
    pretrain_recover(
        Config(root_dir=root, checkpoint_dir=rec_dir, flow_ckpt=pwc_ckpt,
               **common),
        steps=2, verbose=False)
    rec_ckpt = os.path.join(rec_dir, "recover-final")
    assert ckpt.checkpoint_exists(rec_ckpt)

    # Stage 3: adversarial training consuming both bootstrap checkpoints.
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    # num_samples_train=32 at batch 8 -> 4 sub-steps = one full 1:3
    # alternation cycle, so state.step advances (it counts cycles).
    cfg = Config(root_dir=root, checkpoint_dir=model_dir,
                 flow_ckpt=pwc_ckpt, recover_ckpt=rec_ckpt,
                 num_samples_train=32, max_epochs=1, summary_freq=2,
                 save_freq=1, train_crop=0.9, test_crop=0.9, **common)
    state = train(cfg, verbose=False)
    assert int(state.step) > 0
    assert ckpt.checkpoint_exists(os.path.join(model_dir, "model.best"))

    # The restored recover params actually came from stage 2 (not random):
    # train() loads them before stepping, so compare against the stage-2
    # checkpoint through a fresh template restore.
    template = jax.tree.map(np.asarray, state.rec_params)
    saved = ckpt.restore_checkpoint(rec_ckpt, template)
    # One cycle trains recover once; Adam moves each param by O(lr)=1e-4
    # per step regardless of gradient scale, so the elementwise distance to
    # the stage-2 checkpoint is bounded by a few steps — while an
    # independent random init differs by the weight scale (~1e-1).
    for a, b in zip(jax.tree.leaves(saved), jax.tree.leaves(template)):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-3
