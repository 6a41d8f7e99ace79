"""NN primitives shared by the three networks.

These reproduce the reference's layer semantics (models/utils/
convolution_utils.py:4-90) with flax modules, keeping parameters in fp32 and
computing in a configurable dtype (bf16 on TPU for throughput; fp32 for
golden-parity tests). Naming mirrors the TF1 variable scopes so the TF1->JAX
checkpoint converter (train/tf1_import.py) is a pure name map.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear, resize_nearest

BN_EPSILON = 1e-3  # tf.layers.batch_normalization default


def conv_precision(dtype) -> Optional[jax.lax.Precision]:
    """fp32 compute requests full-precision convs (TF parity); bf16 keeps the
    fast MXU path."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def leaky_relu_02(x):
    """tf.nn.leaky_relu default (alpha=0.2) — used by the recover net."""
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def leaky_relu_01(x):
    """LeakyReLU(0.1) — used throughout PWCNet."""
    return jax.nn.leaky_relu(x, negative_slope=0.1)


class GenConv(nn.Module):
    """Conv + inference-mode BatchNorm + ELU (reference gen_conv,
    convolution_utils.py:26-53).

    The reference never runs BN in training mode: moving statistics stay at
    their (0, 1) init and act as a regularizing affine whose gamma/beta ARE
    trained. We keep the statistics in the `batch_stats` collection (frozen;
    XLA constant-folds them) and gamma/beta in `params`.
    """

    features: int
    kernel_size: int
    stride: int = 1
    rate: int = 1
    activation: Optional[Callable] = nn.elu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.rate, self.rate),
            padding="SAME",
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=conv_precision(self.dtype),
            name="conv",
        )(x)
        gamma = self.param("bn_gamma", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("bn_beta", nn.initializers.zeros, (self.features,), jnp.float32)
        moving_mean = self.variable(
            "batch_stats", "bn_moving_mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        moving_var = self.variable(
            "batch_stats", "bn_moving_variance", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = (gamma * jax.lax.rsqrt(moving_var.value + BN_EPSILON)).astype(self.dtype)
        shift = (beta - moving_mean.value * gamma * jax.lax.rsqrt(moving_var.value + BN_EPSILON)).astype(self.dtype)
        x = x * scale + shift
        if self.activation is not None:
            x = self.activation(x)
        return x


class GenDeconv(nn.Module):
    """x2 nearest-neighbor upsample (align_corners=True) + GenConv 3x3
    (reference gen_deconv, convolution_utils.py:55-75)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        x = resize_nearest(x, (2 * h, 2 * w), align_corners=True)
        return GenConv(self.features, 3, 1, dtype=self.dtype, name="conv")(x)


class BiasedConv(nn.Module):
    """Explicit conv + bias + activation (reference `conv`,
    convolution_utils.py:77-85): Xavier init, LeakyReLU(0.2) default."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: Optional[Callable] = leaky_relu_02
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME",
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=conv_precision(self.dtype),
        )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class ResizeConv(nn.Module):
    """Bilinear resize to `size` + BiasedConv stride-1 (reference `deconv`,
    convolution_utils.py:87-90)."""

    features: int
    kernel_size: int = 4
    activation: Optional[Callable] = leaky_relu_02
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, size):
        x = resize_bilinear(x, size)
        return BiasedConv(
            self.features, self.kernel_size, 1, activation=self.activation,
            dtype=self.dtype, name="conv",
        )(x)


class ConvTranspose2D(nn.Module):
    """tf.layers.conv2d_transpose-compatible learned upsampling.

    Kernel is stored in TF layout [kh, kw, out_ch, in_ch] and applied via
    lax.conv_transpose(transpose_kernel=True), which matches TF's
    gradient-of-conv semantics for 'SAME' padding (PWCNet deconv,
    model_pwcnet.py:247-286).

    Accepts either one tensor or a list of channel parts whose concatenation
    is the logical input: deconv(concat(parts)) == sum_i deconv(part_i) with
    the kernel sliced on the input-channel axis. The parts path never
    materializes the concatenation (see PWCConv for why this matters on TPU).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        parts = list(x) if isinstance(x, (list, tuple)) else [x]
        in_ch = sum(p.shape[-1] for p in parts)
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (self.kernel_size, self.kernel_size, self.features, in_ch),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = None
        off = 0
        for p in parts:
            c = p.shape[-1]
            ks = jax.lax.slice(
                kernel,
                (0, 0, 0, off),
                (self.kernel_size, self.kernel_size, self.features, off + c),
            )
            t = jax.lax.conv_transpose(
                p.astype(self.dtype),
                ks.astype(self.dtype),
                strides=(self.stride, self.stride),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
                precision=conv_precision(self.dtype),
            )
            y = t if y is None else y + t
            off += c
        return y + bias.astype(self.dtype)


class _PartsConvCore(nn.Module):
    """Conv over a list of channel parts without concatenating them.

    conv(concat(parts)) == sum_i conv(part_i, kernel[:, :, off_i:off_i+c_i]):
    the kernel is a single parameter with the concatenated input-channel
    extent (so the param tree, init RNG draw, and TF1 checkpoint mapping are
    identical to a monolithic conv), but the input concatenation is never
    materialized. On TPU the dense concats otherwise dominate the PWC forward
    (copies 42.6 ms + concatenate 31.9 ms of a 145 ms batch-32 step in the
    round-1 trace; tools/bench_split_conv.py measures the parts rewrite).

    Named "Conv_0" by callers so parameters land exactly where flax nn.Conv
    auto-naming put them in round 1.
    """

    features: int
    kernel_size: int
    stride: int
    rate: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, parts):
        k = self.kernel_size
        cs = [p.shape[-1] for p in parts]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, k, sum(cs), self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = None
        off = 0
        for p, c in zip(parts, cs):
            ks = jax.lax.slice(kernel, (0, 0, off, 0), (k, k, off + c, self.features))
            t = jax.lax.conv_general_dilated(
                p.astype(self.dtype),
                ks.astype(self.dtype),
                (self.stride, self.stride),
                "SAME",
                rhs_dilation=(self.rate, self.rate),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=conv_precision(self.dtype),
            )
            y = t if y is None else y + t
            off += c
        return y + bias.astype(self.dtype)


class PWCConv(nn.Module):
    """Conv + LeakyReLU(0.1), he_normal init (PWCNet building block,
    model_pwcnet.py:154-167, 484-506, 562-574).

    Input may be a single tensor or a list of channel parts standing for
    their concatenation (never materialized; see _PartsConvCore).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    rate: int = 1
    activation: Optional[Callable] = leaky_relu_01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        parts = list(x) if isinstance(x, (list, tuple)) else [x]
        x = _PartsConvCore(
            self.features, self.kernel_size, self.stride, self.rate,
            self.dtype, name="Conv_0",
        )(parts)
        if self.activation is not None:
            x = self.activation(x)
        return x
