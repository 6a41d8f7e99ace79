"""The composed double-resize must match the two-stage computation."""

import numpy as np

import jax.numpy as jnp

from unsupervised_detection_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_composed,
)


def test_composed_matches_two_stage():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 48, 80, 2).astype(np.float32))
    two_stage = resize_bilinear(resize_bilinear(x, (192, 320)), (96, 160))
    fused = resize_bilinear_composed(x, (192, 320), (96, 160))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(two_stage),
                               rtol=1e-5, atol=1e-5)


def test_scale_commutes():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 24, 40, 2).astype(np.float32))
    a = resize_bilinear_composed(x * 4.0, (96, 160), (48, 80))
    b = resize_bilinear_composed(x, (96, 160), (48, 80)) * 4.0
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
