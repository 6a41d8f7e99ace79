"""Golden tests: TF1-legacy resize semantics vs tf.compat.v1 kernels."""

import numpy as np
import pytest

import jax.numpy as jnp

from unsupervised_detection_tpu.ops import resize as R

tf = pytest.importorskip("tensorflow")


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, size=shape).astype(np.float32)


SIZES = [
    ((384, 640), (192, 384)),  # working-resolution downsample
    ((192, 384), (384, 640)),
    ((6, 12), (12, 24)),  # decoder x2 upsample shapes
    ((12, 24), (24, 48)),
    ((48, 96), (192, 384)),  # PWC final x4 upsample
    ((480, 854), (384, 640)),  # DAVIS raw -> reader size
    ((7, 13), (5, 3)),  # odd sizes
]


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_bilinear_matches_tf_legacy(in_hw, out_hw):
    x = _rand((2, *in_hw, 3))
    want = tf.compat.v1.image.resize_images(tf.constant(x), out_hw).numpy()
    got = np.asarray(R.resize_bilinear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_nearest_matches_tf_legacy(in_hw, out_hw):
    x = _rand((2, *in_hw, 1), seed=1)
    want = tf.compat.v1.image.resize_images(
        tf.constant(x), out_hw, method=tf.image.ResizeMethod.NEAREST_NEIGHBOR
    ).numpy()
    got = np.asarray(R.resize_nearest(jnp.asarray(x), out_hw))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("scale_hw", [(6, 12), (24, 48), (96, 192)])
def test_nearest_x2_align_corners_matches_tf(scale_hw):
    # gen_deconv's upsample: resize_nearest_neighbor x2 with align_corners=True
    # (reference models/utils/convolution_utils.py:4-24,55-75).
    x = _rand((2, *scale_hw, 4), seed=2)
    out_hw = (scale_hw[0] * 2, scale_hw[1] * 2)
    want = tf.compat.v1.image.resize_nearest_neighbor(
        tf.constant(x), out_hw, align_corners=True
    ).numpy()
    got = np.asarray(R.resize_nearest(jnp.asarray(x), out_hw, align_corners=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fraction", [0.85, 0.9, 0.95, 1.0])
def test_central_crop_resize_matches_tf(fraction):
    x = _rand((384, 640, 3), seed=3)
    cropped = tf.image.central_crop(tf.constant(x), fraction)
    want = tf.compat.v1.image.resize_images(cropped, (384, 640)).numpy()
    got = np.asarray(R.central_crop_resize(jnp.asarray(x), fraction))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_crop_resize_matrices_match_static_path():
    # The traced-parameter builder must agree with the cached static builder.
    in_size, out_size = 384, 384
    start, length = R.central_crop_fraction_box(in_size, 0.9)
    scale = np.float32(length) / np.float32(out_size)
    w_dyn = np.asarray(
        R.crop_resize_matrices(
            in_size, out_size, jnp.float32(scale), jnp.float32(start),
            clamp_lo=float(start), clamp_hi=float(start + length - 1),
        )
    )
    w_static = np.asarray(
        R.bilinear_resize_matrix(
            in_size, out_size, False, scale=float(scale), offset=float(start),
            clamp=(float(start), float(start + length - 1)),
        )
    )
    # The traced builder evaluates positions in f32 end-to-end while the
    # static one lerps in f64; agreement to ~1e-5 is expected and sufficient
    # (these matrices drive random augmentation, not metric paths).
    np.testing.assert_allclose(w_dyn, w_static, atol=1e-4)


def test_resize_identity():
    x = _rand((1, 16, 16, 2), seed=4)
    np.testing.assert_allclose(
        np.asarray(R.resize_bilinear(jnp.asarray(x), (16, 16))), x, atol=1e-6
    )
