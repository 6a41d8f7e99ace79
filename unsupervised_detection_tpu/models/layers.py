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

from ..ops.resize import resize_bilinear

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


class _NN2SubpixelConv3(nn.Module):
    """3x3 conv applied to the x2 nearest-neighbor upsample of the input —
    computed WITHOUT materializing the upsample.

    With align_corners=True the x2 NN upsample is exactly pixel replication
    (src = floor(o / 2)), so a SAME 3x3 conv over it collapses, per output
    parity (di, dj) in {0,1}^2, into a 2x2 conv over the ORIGINAL grid whose
    kernel sums adjacent taps of the 3x3 kernel:

        rows for di=0: [K0, K1+K2] (pad top),  di=1: [K0+K1, K2] (pad bottom)

    and the four parity outputs interleave back to the 2x-resolution image.
    Identical math (kernel-tap additions reassociated), 2.25x fewer MXU
    FLOPs, and none of the upsample matmuls/layout copies that made the
    decoder the generator's hottest region on TPU. Parameter names, shapes,
    and init match nn.Conv(name=...) exactly, so checkpoints are unaffected.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    epilogue: Optional[Callable] = None  # elementwise, applied per parity
                                         # pre-interleave so it fuses into the
                                         # four small conv output fusions

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(),
            (3, 3, cin, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        def collapse(k, parity, axis):
            k0, k1, k2 = (jax.lax.index_in_dim(k, i, axis) for i in range(3))
            pair = (k0, k1 + k2) if parity == 0 else (k0 + k1, k2)
            return jnp.concatenate(pair, axis=axis)

        rows = []
        for di in (0, 1):
            cols = []
            for dj in (0, 1):
                k2x2 = collapse(collapse(kernel, di, 0), dj, 1).astype(self.dtype)
                pad = ((1 - di, di), (1 - dj, dj))
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), k2x2, (1, 1), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=conv_precision(self.dtype),
                ) + bias.astype(self.dtype)
                cols.append(self.epilogue(y) if self.epilogue else y)
            rows.append(jnp.stack(cols, axis=3))       # (B, h, w, 2, C)
        z = jnp.stack(rows, axis=2)                    # (B, h, 2, w, 2, C)
        b, h, _, w, _, c = z.shape
        return z.reshape(b, 2 * h, 2 * w, c)


class GenConv(nn.Module):
    """Conv + inference-mode BatchNorm + ELU (reference gen_conv,
    convolution_utils.py:26-53).

    The reference never runs BN in training mode: moving statistics stay at
    their (0, 1) init and act as a regularizing affine whose gamma/beta ARE
    trained. We keep the statistics in the `batch_stats` collection (frozen;
    XLA constant-folds them) and gamma/beta in `params`.

    With `nn2_upsample=True` the conv consumes the x2 nearest-neighbor
    upsample of the input via the subpixel decomposition (_NN2SubpixelConv3)
    instead of a materialized resize; requires kernel 3, stride 1, rate 1.
    """

    features: int
    kernel_size: int
    stride: int = 1
    rate: int = 1
    activation: Optional[Callable] = nn.elu
    dtype: jnp.dtype = jnp.float32
    nn2_upsample: bool = False

    @nn.compact
    def __call__(self, x):
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

        def bn_act(y):
            y = y * scale + shift
            return self.activation(y) if self.activation is not None else y

        if self.nn2_upsample:
            assert (self.kernel_size, self.stride, self.rate) == (3, 1, 1)
            # BN+activation ride along as the subpixel conv's per-parity
            # epilogue (elementwise, so interleave-order commutes).
            return _NN2SubpixelConv3(self.features, dtype=self.dtype,
                                     epilogue=bn_act, name="conv")(x)
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
        return bn_act(x)


class GenDeconv(nn.Module):
    """x2 nearest-neighbor upsample (align_corners=True) + GenConv 3x3
    (reference gen_deconv, convolution_utils.py:55-75)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # The x2 NN upsample + 3x3 conv runs as the subpixel decomposition
        # (see _NN2SubpixelConv3) — same math, no upsampled intermediate.
        return GenConv(self.features, 3, 1, dtype=self.dtype,
                       nn2_upsample=True, name="conv")(x)


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
