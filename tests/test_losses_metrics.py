"""Unit tests for losses, metrics, flow utilities."""

import numpy as np
import jax.numpy as jnp

from unsupervised_detection_tpu.ops.losses import charbonnier_loss
from unsupervised_detection_tpu.ops import metrics as M
from unsupervised_detection_tpu.ops.flow import standardize_flow, flow_to_image


def test_charbonnier_oracle():
    rng = np.random.RandomState(0)
    gt = rng.randn(3, 4, 5, 2).astype(np.float32)
    pred = rng.randn(3, 4, 5, 2).astype(np.float32)
    mask = (rng.rand(3, 4, 5, 1) > 0.5).astype(np.float32)
    want = np.sum(
        ((gt - pred) ** 2 + 1e-3**2) ** 0.5 * mask, axis=(1, 2, 3)
    )
    got = np.asarray(charbonnier_loss(jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_charbonnier_l2_mode():
    gt = np.ones((1, 2, 2, 2), np.float32)
    pred = np.zeros_like(gt)
    got = float(charbonnier_loss(jnp.asarray(gt), jnp.asarray(pred), jnp.ones((1, 2, 2, 1)), cbn=1.0)[0])
    np.testing.assert_allclose(got, (1.0 + 1e-6) * 8, rtol=1e-6)


def test_iou_simple():
    gt = np.zeros((1, 4, 4, 1), bool)
    gt[0, :2] = True
    pred = np.zeros_like(gt)
    pred[0, 1:3] = True
    got = float(M.iou(jnp.asarray(gt), jnp.asarray(pred))[0])
    np.testing.assert_allclose(got, 4.0 / 12.0, rtol=1e-5)


def test_iou_both_empty_is_zero_over_epsilon():
    gt = np.zeros((1, 4, 4, 1), bool)
    got = float(M.iou(jnp.asarray(gt), jnp.asarray(gt))[0])
    assert got == 0.0


def test_boundary_score_full_mask():
    m = jnp.ones((1, 10, 20, 1))
    np.testing.assert_allclose(float(M.boundary_score(m)[0]), 1.0, rtol=1e-6)


def test_disambiguation_flips_background_mask():
    # A mask covering everything except a small center hole occupies the whole
    # border -> declared background -> complement chosen.
    m = np.ones((1, 10, 10, 1), np.float32)
    m[0, 4:6, 4:6] = 0.0
    out = np.asarray(M.disambiguate_forward_background(jnp.asarray(m)))
    np.testing.assert_allclose(out, 1.0 - m)


def test_disambiguation_keeps_center_blob():
    m = np.zeros((1, 10, 10, 1), np.float32)
    m[0, 3:7, 3:7] = 1.0
    out = np.asarray(M.disambiguate_forward_background(jnp.asarray(m)))
    np.testing.assert_allclose(out, m)


def test_compute_all_iou_perfect():
    gt = np.zeros((2, 8, 8, 1), np.float32)
    gt[:, 2:5, 2:5] = 1.0
    pred = gt * 0.9  # soft mask above threshold inside blob
    got = np.asarray(M.compute_all_iou(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, 1.0, rtol=1e-5)


def test_standardize_flow_moments():
    rng = np.random.RandomState(1)
    flow = rng.randn(2, 16, 16, 2).astype(np.float32) * 5 + 3
    out = np.asarray(standardize_flow(jnp.asarray(flow)))
    np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=(1, 2)), 1.0, atol=1e-4)


def test_flow_to_image_range_and_shape():
    rng = np.random.RandomState(2)
    flow = rng.randn(2, 8, 8, 2).astype(np.float32) * 4
    img = np.asarray(flow_to_image(jnp.asarray(flow)))
    assert img.shape == (2, 8, 8, 3)
    assert img.min() >= 0.0 and img.max() <= 255.0
    # quantized to integers like the reference's uint8 cast
    np.testing.assert_array_equal(img, np.floor(img))
