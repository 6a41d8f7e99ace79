"""Mask generator network.

Reproduces the reference generator_net (models/nets.py:4-42): an
inpainting-style encoder/decoder over concat(image[3], standardized flow[2])
with two stride-2 downsamples, four dilated convs (rates 2/4/8/16), additive
skip connections at three scales, a temperature-10 two-way softmax head, and
channel 0 as the mask probability.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import GenConv, GenDeconv


class GeneratorNet(nn.Module):
    """Mask net. Input images/flows in reference normalization
    ([-0.5, 0.5] images, standardized flow); output mask in [0, 1]."""

    cnum: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, flows):
        c = self.cnum
        dt = self.dtype
        x = jnp.concatenate([images, flows], axis=3).astype(dt)

        x0 = GenConv(c, 5, 1, dtype=dt, name="conv1")(x)
        x = GenConv(2 * c, 3, 2, dtype=dt, name="conv2_downsample")(x0)
        x1 = GenConv(2 * c, 3, 1, dtype=dt, name="conv3")(x)
        x = GenConv(4 * c, 3, 2, dtype=dt, name="conv4_downsample")(x1)
        x = GenConv(4 * c, 3, 1, dtype=dt, name="conv5")(x)
        x2 = GenConv(4 * c, 3, 1, dtype=dt, name="conv6")(x)
        x = GenConv(4 * c, 3, rate=2, dtype=dt, name="conv7_atrous")(x2)
        x = GenConv(4 * c, 3, rate=4, dtype=dt, name="conv8_atrous")(x)
        x = GenConv(4 * c, 3, rate=8, dtype=dt, name="conv9_atrous")(x)
        x = GenConv(4 * c, 3, rate=16, dtype=dt, name="conv10_atrous")(x)
        x = GenConv(4 * c, 3, 1, dtype=dt, name="conv11")(x) + x2
        x = GenConv(4 * c, 3, 1, dtype=dt, name="conv12")(x)
        x = GenDeconv(2 * c, dtype=dt, name="conv13_upsample")(x)
        x = GenConv(2 * c, 3, 1, dtype=dt, name="conv14")(x) + x1
        x = GenDeconv(c, dtype=dt, name="conv15_upsample")(x) + x0
        x = GenConv(c // 2, 3, 1, dtype=dt, name="conv16")(x)
        x = GenConv(2, 3, 1, activation=None, dtype=dt, name="conv17")(x)

        # Temperature division found to stabilize the adversarial game
        # (nets.py:37-41); softmax over {mask, not-mask}, keep channel 0.
        x = x.astype(jnp.float32) / 10.0
        mask = nn.softmax(x, axis=-1)[..., 0:1]
        return mask
