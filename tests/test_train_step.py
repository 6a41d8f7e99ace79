"""Integration: the jitted two-player train step on an 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train import AdversarialLearner


@pytest.fixture(scope="module")
def tiny_config():
    return Config(
        img_height=32, img_width=64,
        reader_height=64, reader_width=128,
        batch_size=8, train_crop=0.9, test_crop=0.9,
    )


@pytest.fixture(scope="module")
def learner(tiny_config):
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    return AdversarialLearner(tiny_config)


@pytest.fixture(scope="module")
def state(learner):
    return learner.init_state(jax.random.PRNGKey(0))


def _batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(cfg.reader_height, cfg.reader_width + 16, 3).astype(np.float32) - 0.5
    img1 = np.stack([base[:, i : i + cfg.reader_width] for i in range(cfg.batch_size)])
    img2 = np.stack([base[:, i + 2 : i + 2 + cfg.reader_width] for i in range(cfg.batch_size)])
    return jnp.asarray(img1), jnp.asarray(img2)


def test_alternation_schedule(learner):
    # iters_rec=1, iters_gen=3 -> sub-steps 1,2,3 generator; 4 recover; ...
    assert learner.select_step(1) is learner.generator_step
    assert learner.select_step(2) is learner.generator_step
    assert learner.select_step(3) is learner.generator_step
    assert learner.select_step(4) is learner.recover_step
    assert learner.select_step(8) is learner.recover_step


def test_train_steps_update_params(learner, state, tiny_config):
    img1, img2 = _batch(tiny_config)
    img1, img2 = learner.shard((img1, img2))

    gen_before = jax.tree.map(lambda x: np.asarray(x), state.gen_params)
    rec_before = jax.tree.map(lambda x: np.asarray(x), state.rec_params)
    pwc_before = np.asarray(jax.tree.leaves(state.pwc_params)[0])

    # The steps donate their input state; work on a copy so the shared
    # module-scoped fixture stays alive for the other tests.
    state0 = jax.tree.map(jnp.copy, state)
    state1, losses, grads = learner.generator_step(state0, img1, img2)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), k

    state2, losses2, _ = learner.recover_step(state1, img1, img2)
    assert np.isfinite(np.asarray(losses2["recover"]))

    # generator params moved in step 1, recover params in step 2, pwc frozen
    gen_after = jax.tree.leaves(state2.gen_params)
    changed = [
        not np.allclose(a, b)
        for a, b in zip(gen_after, jax.tree.leaves(gen_before))
    ]
    assert any(changed)
    rec_after = jax.tree.leaves(state2.rec_params)
    changed_rec = [
        not np.allclose(a, b)
        for a, b in zip(rec_after, jax.tree.leaves(rec_before))
    ]
    assert any(changed_rec)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state2.pwc_params)[0]), pwc_before
    )

    # store for subsequent tests via module cache
    test_train_steps_update_params.state = state2


def test_val_step_returns_iou_sum(learner, state, tiny_config):
    cfg = tiny_config
    img1, img2 = _batch(cfg, seed=1)
    gt = jnp.zeros((cfg.batch_size, cfg.reader_height, cfg.reader_width, 1))
    img1, img2, gt = learner.shard((img1, img2, gt))
    iou_sum = learner.val_step(state, img1, img2, gt)
    v = float(iou_sum)
    assert np.isfinite(v)
    assert 0.0 <= v <= cfg.batch_size


def test_losses_match_reference_structure(learner, state, tiny_config):
    img1, img2 = _batch(tiny_config, seed=2)
    img1, img2 = learner.shard((img1, img2))
    _, losses, _ = learner.generator_step(jax.tree.map(jnp.copy, state), img1, img2)
    want_keys = {
        "generator", "recover", "red_rate", "red_rate_compl",
        "reconstruction_loss", "reconstruction_compl_loss",
        "denominator_red_rate", "denominator_red_rate_compl",
    }
    assert set(losses.keys()) == want_keys
    # generator loss = red_rate + red_rate_compl (adversarial_learner.py:194)
    np.testing.assert_allclose(
        float(losses["generator"]),
        float(losses["red_rate"]) + float(losses["red_rate_compl"]),
        rtol=1e-5,
    )


def test_model_axis_mesh_equivalence(tiny_config):
    """A ("data"=4, "model"=2) mesh runs the train step with results equal to
    the default 8x1 mesh. The model axis is REAL here: the PWC cost volume's
    offset axis is shard-constrained along it (train/objective.py), so each
    model-axis device computes half the correlation shifts and XLA inserts
    the ICI collective where the estimator consumes all of them. The 4-way
    data x 2-way model result must match the 8-way data-parallel one up to
    reduction order."""
    cfg = tiny_config.replace(mesh_model=2, mesh_data=0)
    learner2 = AdversarialLearner(cfg)
    assert learner2.mesh.devices.shape == (4, 2)
    assert learner2.objective.pwc.costvol_offset_sharding is not None
    state2 = learner2.init_state(jax.random.PRNGKey(0))

    learner1 = AdversarialLearner(tiny_config)
    state1 = learner1.init_state(jax.random.PRNGKey(0))

    img1, img2 = _batch(tiny_config)
    out1, losses1, _ = learner1.generator_step(state1, img1, img2)
    out2, losses2, _ = learner2.generator_step(state2, img1, img2)
    for k in losses1:
        np.testing.assert_allclose(float(losses1[k]), float(losses2[k]),
                                   rtol=2e-5, atol=2e-6)
    a = jax.tree.leaves(out1.gen_params)[0]
    b = jax.tree.leaves(out2.gen_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-6)
