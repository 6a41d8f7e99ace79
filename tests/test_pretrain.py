"""Recover pretraining: box masks + a few training steps reduce the loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train.pretrain import pretrain_recover, random_box_masks

from synthetic import make_moving_square_davis


def test_random_box_masks_properties():
    masks = random_box_masks(jax.random.PRNGKey(0), 16, 32, 48)
    m = np.asarray(masks)
    assert m.shape == (16, 32, 48, 1)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    fracs = m.mean(axis=(1, 2, 3))
    assert (fracs > 0.01).all() and (fracs < 0.25).all()
    # boxes are contiguous: each row profile has one run of ones
    for b in range(4):
        rows = m[b, :, :, 0].max(axis=1)
        transitions = np.abs(np.diff(rows)).sum()
        assert transitions <= 2


def test_pretrain_steps_reduce_loss(tmp_path):
    root = make_moving_square_davis(str(tmp_path / "davis"), frames=8, hw=(128, 192))
    cfg = Config(
        root_dir=root, checkpoint_dir=str(tmp_path / "ck"),
        img_height=32, img_width=64, reader_height=64, reader_width=128,
        batch_size=8, num_threads=2,
    )
    params = pretrain_recover(cfg, steps=3, verbose=False, save_every=2)
    assert params is not None
    import os

    entries = os.listdir(cfg.checkpoint_dir)
    assert any(e.startswith("recover-") for e in entries), entries
