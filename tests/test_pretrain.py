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
        batch_size=8, num_threads=2, allow_random_flow=True,
    )
    params = pretrain_recover(cfg, steps=3, verbose=False, save_every=2)
    assert params is not None
    import os

    entries = os.listdir(cfg.checkpoint_dir)
    assert any(e.startswith("recover-") for e in entries), entries


def test_pretrain_requires_flow_ckpt_or_optout(tmp_path):
    """Same contract as train.py (adversarial_learner.py:339-343): without a
    flow checkpoint the inpainting targets are garbage, so the stage aborts
    unless --allow_random_flow opts out explicitly."""
    root = make_moving_square_davis(str(tmp_path / "davis"), frames=8, hw=(128, 192))
    cfg = Config(root_dir=root, img_height=32, img_width=64,
                 reader_height=64, reader_width=128, batch_size=8)
    with pytest.raises(SystemExit, match="allow_random_flow"):
        pretrain_recover(cfg, steps=1, verbose=False)


def test_pretrain_consumes_pretrain_flow_ckpt(tmp_path):
    """--flow_ckpt accepts a native pwc-scope checkpoint from
    pretrain_flow.py, not only TF1 ones — the from-scratch bootstrap chain
    pretrain_flow -> pretrain_recover -> train needs no external assets."""
    from unsupervised_detection_tpu.train import checkpoint as ckpt
    from unsupervised_detection_tpu.train.objective import AdversarialObjective

    pwc_dir = tmp_path / "pwc_ck"
    pwc_dir.mkdir()
    pcfg = Config(batch_size=2, reader_height=64, reader_width=128,
                  img_height=32, img_width=64, seed=3)
    obj = AdversarialObjective(pcfg)
    pwc_params = obj.pwc.init(
        jax.random.PRNGKey(3),
        jnp.zeros((1, 64, 128, 3)), jnp.zeros((1, 64, 128, 3)))["params"]
    path = ckpt.save_checkpoint(str(pwc_dir), "pwc-final", pwc_params)

    root = make_moving_square_davis(str(tmp_path / "davis"), frames=8, hw=(128, 192))
    cfg = Config(root_dir=root, checkpoint_dir=str(tmp_path / "ck"),
                 img_height=32, img_width=64, reader_height=64,
                 reader_width=128, batch_size=8, num_threads=2,
                 flow_ckpt=path)
    params = pretrain_recover(cfg, steps=2, verbose=False, save_every=2)
    assert params is not None
