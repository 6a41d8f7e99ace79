"""End-to-end: train a few cycles on synthetic data, then evaluate.

Exercises the full driver path (readers -> host loader -> device preprocess
-> jitted two-player steps -> validation -> checkpointing -> evaluator) on a
miniature moving-square DAVIS tree with tiny network resolutions.
"""

import os

import numpy as np
import pytest

import jax

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.eval import evaluate_dataset
from unsupervised_detection_tpu.train import checkpoint as ckpt
from unsupervised_detection_tpu.train.driver import train

from synthetic import make_moving_square_davis


@pytest.fixture(scope="module")
def davis_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("davis_e2e")
    return make_moving_square_davis(str(root), frames=10, hw=(128, 192))


def _tiny_config(root, ckpt_dir):
    return Config(
        root_dir=root,
        checkpoint_dir=ckpt_dir,
        img_height=32, img_width=64,
        reader_height=64, reader_width=128,
        batch_size=8,
        num_samples_train=8,      # 1 step per "epoch"
        max_epochs=2,
        summary_freq=2,
        save_freq=1,
        num_threads=2,
        train_crop=0.9,
        test_crop=0.9,
        allow_random_flow=True,
    )


def test_missing_flow_ckpt_aborts(davis_root):
    # Reference parity: no --flow_ckpt is a hard error
    # (adversarial_learner.py:339-343) unless --allow_random_flow.
    cfg = _tiny_config(davis_root, "").replace(allow_random_flow=False)
    with pytest.raises(SystemExit, match="flow network"):
        train(cfg, verbose=False)


def test_train_and_evaluate(davis_root, tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    cfg = _tiny_config(davis_root, ckpt_dir)

    state = train(cfg, verbose=True)
    assert state is not None

    # checkpoints written: best + per-epoch
    entries = os.listdir(ckpt_dir)
    assert any(e.startswith("model.best") for e in entries), entries
    assert any(e.startswith("model-") for e in entries), entries

    # restore roundtrip preserves values
    from unsupervised_detection_tpu.train import AdversarialLearner

    learner = AdversarialLearner(cfg)
    fresh = learner.init_state(jax.random.PRNGKey(1))
    best = os.path.join(ckpt_dir, "model.best")
    restored = ckpt.restore_checkpoint(best, fresh)
    a = jax.tree.leaves(state.gen_params)[0]
    # best may be from an earlier epoch than final state; just check the
    # restore loads without shape errors and differs from the fresh init.
    b = jax.tree.leaves(restored.gen_params)[0]
    f = jax.tree.leaves(fresh.gen_params)[0]
    assert a.shape == b.shape
    assert not np.allclose(np.asarray(b), np.asarray(f))

    # full evaluation path over the val partition (metrics-only fast path)
    results = evaluate_dataset(cfg, restored, verbose=True)
    assert results["frames"] >= 10
    assert 0.0 <= results["dataset_iou"] <= 1.0
    assert np.isfinite(results["dataset_mae"])
    assert set(results["category_iou"].keys()) == {"seq_b"}

    # the dense (visualization) path must produce identical metrics — it
    # computes IoU/MAE on host from fetched masks instead of on device
    viz_dir = str(tmp_path / "viz")
    dense = evaluate_dataset(cfg, restored, save_dir=viz_dir,
                             generate_visualization=True, verbose=False)
    assert dense["frames"] == results["frames"]
    np.testing.assert_allclose(dense["dataset_iou"], results["dataset_iou"],
                               atol=1e-5)
    np.testing.assert_allclose(dense["dataset_mae"], results["dataset_mae"],
                               atol=1e-5)
    assert os.path.isdir(os.path.join(viz_dir, "seq_b"))
