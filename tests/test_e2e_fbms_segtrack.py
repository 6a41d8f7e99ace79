"""End-to-end FBMS59 + SegTrackV2 evaluation on synthetic trees.

The readers are unit-tested in test_fbms_segtrack.py; these tests drive the
FULL evaluation paths the way test_e2e_synthetic.py drives DAVIS:

  * FBMS: evaluate_dataset through the explicit-tuples branch
    (eval/evaluator.py FBMS dispatch) and the host-resize feed mode
    (per-sequence frame sizes force raw_hw=None, data/loader.py) — the
    reference protocol is data/fbms_data_utils.py:328-347;
  * SegTrack: evaluate_dataset over the "all" partition
    (data/segtrackv2_data_utils.py:214-289);
  * the ensemble CLI (test_generator_ensemble._test_masks) end-to-end on
    FBMS including the multi-crop .mat buffer dump.
"""

import os

import numpy as np
import pytest

import jax

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.eval import evaluate_dataset
from unsupervised_detection_tpu.train import AdversarialLearner
from unsupervised_detection_tpu.train import checkpoint as ckpt

from synthetic import make_fbms_tree, make_segtrack_tree


@pytest.fixture(scope="module")
def fbms_root(tmp_path_factory):
    return make_fbms_tree(str(tmp_path_factory.mktemp("fbms_e2e")))


@pytest.fixture(scope="module")
def segtrack_root(tmp_path_factory):
    return make_segtrack_tree(str(tmp_path_factory.mktemp("segtrack_e2e")))


def _cfg(dataset, root, batch):
    return Config(
        dataset=dataset, root_dir=root,
        img_height=32, img_width=64,
        reader_height=64, reader_width=128,
        batch_size=batch, num_threads=2,
        test_temporal_shift=1, test_crop=0.9,
        allow_random_flow=True,
    )


@pytest.fixture(scope="module")
def state_cache():
    # One random-init state shared across tests (weights don't matter for
    # path coverage; the tiny shapes keep compiles cheap).
    return {}


def _state_for(cfg, cache):
    key = cfg.batch_size
    if key not in cache:
        learner = AdversarialLearner(cfg)
        cache[key] = learner.init_state(jax.random.PRNGKey(0))
    return cache[key]


def test_fbms_evaluate_dataset_end_to_end(fbms_root, state_cache):
    # 3 annotated frames in cars1 (6 frames) + 3 in marple7 (5 frames)
    # -> 6 explicit tuples; batch 3 -> 2 full batches, no wrap duplicates.
    cfg = _cfg("FBMS", fbms_root, batch=3).replace(test_partition="val")
    state = _state_for(cfg, state_cache)
    results = evaluate_dataset(cfg, state, verbose=True)
    assert results["frames"] == 6
    assert set(results["category_iou"]) == {"cars1", "marple7"}
    assert 0.0 <= results["dataset_iou"] <= 1.0
    assert np.isfinite(results["dataset_mae"])
    # Host-resize mode really ran: sequences have different raw sizes, so the
    # raw-mode uniform-stack path cannot have produced these batches.


def test_segtrack_evaluate_dataset_end_to_end(segtrack_root, state_cache):
    # 2 sequences x 5 frames, "all" partition -> 10 samples; batch 5.
    cfg = _cfg("SEGTRACK", segtrack_root, batch=5)
    state = _state_for(cfg, state_cache)
    results = evaluate_dataset(cfg, state, verbose=True)
    assert results["frames"] == 10
    assert set(results["category_iou"]) == {"birds", "worm"}
    assert 0.0 <= results["dataset_iou"] <= 1.0
    assert np.isfinite(results["dataset_mae"])


def test_ensemble_cli_fbms_end_to_end(fbms_root, state_cache, tmp_path):
    import scipy.io as sio

    import test_generator_ensemble as cli

    cfg = _cfg("FBMS", fbms_root, batch=3).replace(
        test_partition="val",
        generate_visualization=True,
        test_save_dir=str(tmp_path / "buffer"),
    )
    state = _state_for(cfg, state_cache)
    path = ckpt.save_checkpoint(str(tmp_path / "ckpts"), "model.test", state)
    cfg = cfg.replace(ckpt_file=path)

    cli._test_masks(cfg)

    # Multi-crop buffers written per category with the reference's key scheme
    # (img_1_XXX / pred_mask_XXX / gt_mask_XXX, test_generator_ensemble.py:102-111).
    for cat, n_frames in (("cars1", 3), ("marple7", 3)):
        cat_dir = str(tmp_path / "buffer" / cat)
        mats = sorted(os.listdir(cat_dir))
        assert len(mats) == n_frames, mats
        data = sio.loadmat(os.path.join(cat_dir, mats[0]))
        for crop_key in ("085", "090", "095", "100"):
            assert "img_1_" + crop_key in data
            assert "pred_mask_" + crop_key in data
            assert "gt_mask_" + crop_key in data
        # (H, W, 1): the reference also dumps the un-squeezed mask tensors
        # (test_generator_ensemble.py:102-111 upstream).
        assert data["pred_mask_100"].shape == (32, 64, 1)
