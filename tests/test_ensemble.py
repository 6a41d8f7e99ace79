"""EnsembleEvaluator unit tests (the aug_test path, eval/ensemble.py).

The reference builds four per-crop batch-1 subgraphs
(adversarial_learner.py:525-592); here the crop axis is a batch axis. These
tests pin the semantics: output shapes/count match the crop grid, and the
crop=1.0 ensemble member equals the plain evaluation path at test_crop=1.0
on the same parameters and inputs.
"""

import numpy as np
import pytest

import jax

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.eval.ensemble import TEST_CROPS, EnsembleEvaluator
from unsupervised_detection_tpu.eval.evaluator import Evaluator
from unsupervised_detection_tpu.train.learner import AdversarialLearner


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        img_height=32, img_width=64,
        reader_height=64, reader_width=128,
        batch_size=4, test_crop=1.0,
        allow_random_flow=True,
    )
    state = AdversarialLearner(cfg).init_state(jax.random.PRNGKey(3))
    rng = np.random.RandomState(0)
    img1 = (rng.rand(4, 64, 128, 3).astype(np.float32) - 0.5)
    img2 = (rng.rand(4, 64, 128, 3).astype(np.float32) - 0.5)
    gt = (rng.rand(4, 64, 128, 1) > 0.5).astype(np.float32)
    return cfg, state, img1, img2, gt


def test_ensemble_output_shapes(setup):
    cfg, state, img1, img2, gt = setup
    ens = EnsembleEvaluator(cfg)
    out = ens.run(state, {"img1": img1, "img2": img2, "gt": gt})
    n_crops = len(TEST_CROPS)
    assert out["pred_masks"].shape == (n_crops, 4, 32, 64, 1)
    assert out["gt_masks"].shape == (n_crops, 4, 32, 64, 1)
    assert out["img_1s"].shape == (n_crops, 4, 32, 64, 3)
    masks = np.asarray(out["pred_masks"], np.float32)
    assert np.all(masks >= 0.0) and np.all(masks <= 1.0)
    # The four crop members must actually differ (different receptive fields).
    assert not np.allclose(masks[0], masks[3])


def test_ensemble_full_crop_matches_plain_evaluator(setup):
    cfg, state, img1, img2, gt = setup
    ens = EnsembleEvaluator(cfg)
    out = ens.run(state, {"img1": img1, "img2": img2, "gt": gt})
    full_idx = TEST_CROPS.index(1.0)

    ev = Evaluator(cfg)  # test_crop=1.0 -> no cropping in infer
    plain = ev.infer(state.gen_params, state.gen_stats, state.rec_params,
                     state.pwc_params, *ens.feeder.images(
                         {"img1": img1, "img2": img2}),
                     ens.feeder.mask({"gt": gt}))
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"][full_idx], np.float32),
        np.asarray(plain["gen_masks"], np.float32), atol=1e-5,
        err_msg="crop=1.0 ensemble member diverges from the plain eval path")
    np.testing.assert_allclose(
        np.asarray(out["gt_masks"][full_idx], np.float32),
        np.asarray(plain["gt_masks"], np.float32), atol=1e-6)
