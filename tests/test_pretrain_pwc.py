"""PWC synthetic pretraining: data construction + training progress."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.ops.warp import dense_image_warp
from unsupervised_detection_tpu.train.pretrain_pwc import (
    multiscale_epe, pretrain_pwc, synthetic_flow_batch)


def test_synthetic_batch_warp_convention():
    """I2(p) = I1(p + F(p)): for a constant integer flow the warp is an
    exact shift, pinning the (dy, dx) sign convention the trainer relies
    on."""
    rs = np.random.RandomState(0)
    img1 = rs.rand(1, 16, 24, 3).astype(np.float32) - 0.5
    flow = np.zeros((1, 16, 24, 2), np.float32)
    flow[..., 0] = 2.0  # dy
    flow[..., 1] = 3.0  # dx
    img2 = np.asarray(dense_image_warp(jnp.asarray(img1), jnp.asarray(-flow)))
    # Away from the clamped borders, I2[y, x] == I1[y+2, x+3].
    np.testing.assert_allclose(img2[0, 2:13, 2:20], img1[0, 4:15, 5:23],
                               atol=1e-6)


def test_synthetic_batch_shapes_and_bounds():
    rs = np.random.RandomState(1)
    img1, img2, flow = synthetic_flow_batch(rs, 2, 32, 64, max_mag=5.0)
    assert img1.shape == (2, 32, 64, 3) and img2.shape == (2, 32, 64, 3)
    assert flow.shape == (2, 32, 64, 2)
    assert np.abs(flow).max() <= 5.0
    assert np.abs(img1).max() <= 0.5


def test_multiscale_epe_zero_at_perfect_prediction():
    rs = np.random.RandomState(2)
    gt = jnp.asarray(rs.randn(1, 32, 64, 2).astype(np.float32))
    pyr = [gt[:, ::8, ::8] / 4.0, gt[:, ::4, ::4] / 4.0]
    # Perfect final prediction, imperfect pyramid: epe component must be 0.
    loss, epe = multiscale_epe(gt, pyr, gt)
    assert float(epe) == 0.0
    assert float(loss) >= 0.0


def test_pretrain_pwc_reduces_epe(tmp_path):
    """A short run on small constant-translation scenes must cut EPE
    substantially from the random-init baseline, and write a pwc-scope
    checkpoint restorable by the train driver."""
    cfg = Config(batch_size=4, reader_height=64, reader_width=64,
                 img_height=32, img_width=32, seed=0,
                 checkpoint_dir=str(tmp_path / "pwc_ckpt"))

    def easy_batches(rng, batch, h, w):
        # Constant small translations only — learnable in tens of steps.
        return synthetic_flow_batch(rng, batch, h, w, max_mag=3.0)

    import os

    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    params0, epe0 = pretrain_pwc(cfg, steps=1, verbose=False,
                                 batch_fn=easy_batches)
    params, epe = pretrain_pwc(cfg, steps=40, verbose=False,
                               batch_fn=easy_batches, save_every=40)
    assert np.isfinite(epe)
    assert epe < 0.7 * epe0, (epe0, epe)

    # The checkpoint is a bare pwc-scope save the driver can restore.
    from unsupervised_detection_tpu.train import checkpoint as ckpt

    restored = ckpt.restore_checkpoint(
        os.path.join(cfg.checkpoint_dir, "pwc-final"), params)
    a = jax.tree.leaves(restored)[0]
    b = jax.tree.leaves(params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_flow_ckpt_feeds_train_driver(tmp_path):
    """pretrain_flow's pwc-scope checkpoint loads through train.py's
    --flow_ckpt scope-restore path (driver._restore_scope; the reference's
    mandatory pwcnet-scope restore, adversarial_learner.py:339-343). Conv
    params are resolution-independent, so a ckpt trained at one reader size
    restores into any train config."""
    from synthetic import make_moving_square_davis
    from unsupervised_detection_tpu.train import AdversarialLearner
    from unsupervised_detection_tpu.train.driver import _restore_scope

    cfg = Config(batch_size=4, reader_height=64, reader_width=64,
                 img_height=32, img_width=32, seed=0,
                 checkpoint_dir=str(tmp_path / "pwc_ckpt"))
    import os

    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    params, _ = pretrain_pwc(cfg, steps=1, verbose=False, save_every=1)
    path = os.path.join(cfg.checkpoint_dir, "pwc-final")

    train_cfg = Config(batch_size=8, reader_height=64, reader_width=128,
                       img_height=32, img_width=64, flow_ckpt=path)
    learner = AdversarialLearner(train_cfg)
    state = learner.init_state(jax.random.PRNGKey(1))
    state = _restore_scope(path, state, "pwc")
    got = jax.tree.leaves(state.pwc_params)[0]
    want = jax.tree.leaves(params)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_full_state_save_feeds_flow_ckpt_paths(tmp_path):
    """A FULL TrainState save (train.py's model-<epoch>/model.best) is also
    accepted everywhere a pwc-scope checkpoint is: both by the train driver's
    --flow_ckpt restore and by the bare-template path the pretrain stages use
    (checkpoint.restore_params_scope's raw-restore fallback — regression test
    for the dual-format contract its docstring promises)."""
    from unsupervised_detection_tpu.train import AdversarialLearner
    from unsupervised_detection_tpu.train import checkpoint as ckpt
    from unsupervised_detection_tpu.train.driver import _restore_scope

    cfg = Config(batch_size=4, reader_height=64, reader_width=64,
                 img_height=32, img_width=32, seed=0)
    learner = AdversarialLearner(cfg)
    state = learner.init_state(jax.random.PRNGKey(0))
    path = ckpt.save_checkpoint(str(tmp_path), "model-1", state)

    # Bare template (the pretrain_recover --flow_ckpt path).
    template = jax.tree.map(jnp.zeros_like, state.pwc_params)
    restored = ckpt.restore_params_scope(path, template, "pwc_params")
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored)[0]),
        np.asarray(jax.tree.leaves(state.pwc_params)[0]))

    # Through the train driver (train.py --flow_ckpt=model.best).
    state2 = learner.init_state(jax.random.PRNGKey(1))
    state2 = _restore_scope(path, state2, "pwc")
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(state2.pwc_params)[0]),
        np.asarray(jax.tree.leaves(state.pwc_params)[0]))


def test_lr_schedule_option(tmp_path):
    """lr_schedule="cosine" trains (warmup+decay wrapped into optax.adam);
    unknown names are rejected."""
    cfg = Config(batch_size=2, reader_height=64, reader_width=64,
                 img_height=32, img_width=32, seed=0)

    def easy_batches(rng, batch, h, w):
        return synthetic_flow_batch(rng, batch, h, w, max_mag=3.0)

    _, epe = pretrain_pwc(cfg, steps=2, verbose=False,
                          batch_fn=easy_batches, lr_schedule="cosine")
    assert np.isfinite(epe)
    with pytest.raises(ValueError):
        pretrain_pwc(cfg, steps=1, verbose=False, batch_fn=easy_batches,
                     lr_schedule="bogus")
