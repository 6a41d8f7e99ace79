"""Golden tests: conv padding/stride/dilation/transpose semantics vs TF.

The reference relies on TF 'SAME' padding (asymmetric for even overhang) and
tf.layers.conv2d_transpose; these tests pin our lax/flax configurations to
the TF kernels with shared weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

tf = pytest.importorskip("tensorflow")


def _conv_tf(x, k, stride, rate=1):
    return tf.nn.conv2d(
        tf.constant(x), tf.constant(k), strides=[1, stride, stride, 1],
        padding="SAME", dilations=[1, rate, rate, 1],
    ).numpy()


@pytest.mark.parametrize("stride,rate,ksize", [(1, 1, 3), (2, 1, 3), (1, 2, 3), (1, 16, 3), (2, 1, 5), (2, 1, 7)])
def test_conv_same_matches_tf(stride, rate, ksize):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 13, 17, 4).astype(np.float32)
    k = rng.randn(ksize, ksize, 4, 6).astype(np.float32)
    want = _conv_tf(x, k, stride, rate)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (stride, stride), "SAME",
        rhs_dilation=(rate, rate), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_flax_conv_matches_tf():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 12, 20, 3).astype(np.float32)
    k = rng.randn(3, 3, 3, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    conv = nn.Conv(8, (3, 3), strides=(2, 2), padding="SAME",
                   precision=jax.lax.Precision.HIGHEST)
    got = conv.apply({"params": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}}, jnp.asarray(x))
    want = _conv_tf(x, k, 2) + b
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("hw", [(6, 10), (7, 9)])
def test_conv_transpose_matches_tf(hw):
    rng = np.random.RandomState(2)
    h, w = hw
    x = rng.randn(2, h, w, 5).astype(np.float32)
    k = rng.randn(4, 4, 3, 5).astype(np.float32)  # TF layout [kh,kw,out,in]
    want = tf.nn.conv2d_transpose(
        tf.constant(x), tf.constant(k),
        output_shape=[2, h * 2, w * 2, 3], strides=[1, 2, 2, 1], padding="SAME",
    ).numpy()
    got = jax.lax.conv_transpose(
        jnp.asarray(x), jnp.asarray(k), strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_elu_and_leaky_relu_match_tf():
    x = np.linspace(-3, 3, 101).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(jax.nn.elu(jnp.asarray(x))), tf.nn.elu(tf.constant(x)).numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.leaky_relu(jnp.asarray(x), 0.2)),
        tf.nn.leaky_relu(tf.constant(x)).numpy(), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.leaky_relu(jnp.asarray(x), 0.1)),
        tf.nn.leaky_relu(tf.constant(x), alpha=0.1).numpy(), rtol=1e-6,
    )


def test_gen_deconv_subpixel_matches_explicit_upsample():
    """GenDeconv's subpixel decomposition (_NN2SubpixelConv3) must equal the
    explicit x2 NN upsample (align_corners=True) + GenConv path it replaces
    (reference gen_deconv, convolution_utils.py:55-75)."""
    from unsupervised_detection_tpu.models.layers import GenConv, GenDeconv
    from unsupervised_detection_tpu.ops.resize import resize_nearest

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 24, 6), jnp.float32)
    mod = GenDeconv(9, dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(variables, x)

    xup = resize_nearest(x, (24, 48), align_corners=True)
    ref_vars = {"params": variables["params"]["conv"],
                "batch_stats": variables["batch_stats"]["conv"]}
    want = GenConv(9, 3, 1, dtype=jnp.float32).apply(ref_vars, xup)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=3e-6)
