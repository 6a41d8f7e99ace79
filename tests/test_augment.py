"""On-device augmentation tests."""

import numpy as np

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.ops.augment import (
    augment_pair,
    random_crop_resize_pair,
    random_flip_pair,
)


def test_flip_distribution_and_consistency():
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(400, 8, 12, 3).astype(np.float32))
    img2 = img1 + 1.0
    out1, out2 = random_flip_pair(jax.random.PRNGKey(1), img1, img2)
    out1, out2 = np.asarray(out1), np.asarray(out2)
    # identical flip applied to both frames
    np.testing.assert_allclose(out2 - out1, 1.0, atol=1e-6)
    x = np.asarray(img1)
    kinds = {"id": 0, "rot": 0, "lr": 0, "td": 0}
    for b in range(x.shape[0]):
        if np.allclose(out1[b], x[b]):
            kinds["id"] += 1
        elif np.allclose(out1[b], x[b, ::-1, ::-1]):
            kinds["rot"] += 1
        elif np.allclose(out1[b], x[b, :, ::-1]):
            kinds["lr"] += 1
        elif np.allclose(out1[b], x[b, ::-1, :]):
            kinds["td"] += 1
    assert sum(kinds.values()) == x.shape[0]
    for k, count in kinds.items():
        assert 50 <= count <= 150, (k, kinds)  # each ~1/4 of 400


def test_crop_resize_shapes_and_range():
    rng = np.random.RandomState(1)
    img1 = jnp.asarray(rng.rand(4, 32, 64, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(4, 32, 64, 3).astype(np.float32))
    out1, out2 = random_crop_resize_pair(jax.random.PRNGKey(2), img1, img2, 0.6)
    assert out1.shape == img1.shape and out2.shape == img2.shape
    assert float(jnp.max(out1)) <= 1.0 + 1e-5 and float(jnp.min(out1)) >= -1e-5


def test_crop_identity_when_fraction_one():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    # min fraction 1.0 forces p=1, offset 0 -> identity resample
    out1, out2 = random_crop_resize_pair(jax.random.PRNGKey(3), img, img, 1.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(img), atol=1e-5)


def test_augment_pair_jits():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    fn = jax.jit(lambda k, a, b: augment_pair(k, a, b, 0.9))
    out1, out2 = fn(jax.random.PRNGKey(4), img, img)
    assert out1.shape == img.shape
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
