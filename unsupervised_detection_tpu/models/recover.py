"""Flow-inpainting recover network ("FlownetS" in the reference).

Reproduces models/nets.py:45-110: two siamese 6-level strided encoders — an
image stream (`aconv*`) and a flow stream (`bconv*`) whose input is
concat(masked_flow[2], ones[1], 1-mask[1]) — followed by a decoder with a
per-scale flow head (`flow5..flow1`), resize-conv upsampling (`deconv*`),
learned flow upsampling (`upflow*`), and a final bilinear resize to the
input resolution. Channel multiplier f=0.25 by default.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .layers import BiasedConv, ResizeConv


class RecoverNet(nn.Module):
    """Flow inpainter: predicts the complete flow from the image and the
    flow observed outside the mask."""

    f: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, flow_masked, mask):
        dt = self.dtype
        f = self.f
        ch = lambda n: int(n * f)
        flow_channels = flow_masked.shape[-1]
        orig_hw = (img1.shape[1], img1.shape[2])

        img1 = img1.astype(dt)
        ones = jnp.ones_like(flow_masked[..., 0:1])
        flow_in = jnp.concatenate([flow_masked, ones, 1.0 - mask], axis=3).astype(dt)

        # Image encoder stream.
        aconv1 = BiasedConv(ch(64), 7, 2, dtype=dt, name="aconv1")(img1)
        aconv2 = BiasedConv(ch(128), 5, 2, dtype=dt, name="aconv2")(aconv1)
        aconv3 = BiasedConv(ch(256), 5, 2, dtype=dt, name="aconv3")(aconv2)
        aconv31 = BiasedConv(ch(256), 3, 1, dtype=dt, name="aconv31")(aconv3)
        aconv4 = BiasedConv(ch(512), 3, 2, dtype=dt, name="aconv4")(aconv31)
        aconv41 = BiasedConv(ch(512), 3, 1, dtype=dt, name="aconv41")(aconv4)
        aconv5 = BiasedConv(ch(512), 3, 2, dtype=dt, name="aconv5")(aconv41)
        aconv51 = BiasedConv(ch(512), 3, 1, dtype=dt, name="aconv51")(aconv5)
        aconv6 = BiasedConv(ch(512), 3, 2, dtype=dt, name="aconv6")(aconv51)

        # Flow encoder stream.
        bconv1 = BiasedConv(ch(64), 7, 2, dtype=dt, name="bconv1")(flow_in)
        bconv2 = BiasedConv(ch(128), 5, 2, dtype=dt, name="bconv2")(bconv1)
        bconv3 = BiasedConv(ch(256), 5, 2, dtype=dt, name="bconv3")(bconv2)
        bconv31 = BiasedConv(ch(256), 3, 1, dtype=dt, name="bconv31")(bconv3)
        bconv4 = BiasedConv(ch(512), 3, 2, dtype=dt, name="bconv4")(bconv31)
        bconv41 = BiasedConv(ch(512), 3, 1, dtype=dt, name="bconv41")(bconv4)
        bconv5 = BiasedConv(ch(512), 3, 2, dtype=dt, name="bconv5")(bconv41)
        bconv51 = BiasedConv(ch(512), 3, 1, dtype=dt, name="bconv51")(bconv5)
        bconv6 = BiasedConv(ch(512), 3, 2, dtype=dt, name="bconv6")(bconv51)

        conv6 = jnp.concatenate([aconv6, bconv6], axis=3)

        def hw(t):
            return (t.shape[1], t.shape[2])

        deconv5 = ResizeConv(ch(512), dtype=dt, name="deconv5")(conv6, hw(bconv51))
        concat5 = jnp.concatenate([deconv5, bconv51, aconv51], axis=3)

        flow5 = BiasedConv(flow_channels, 3, 1, activation=None, dtype=dt, name="flow5")(concat5)
        deconv4 = ResizeConv(ch(512), dtype=dt, name="deconv4")(concat5, hw(bconv41))
        upflow4 = ResizeConv(flow_channels, activation=None, dtype=dt, name="upflow4")(flow5, hw(bconv41))
        concat4 = jnp.concatenate([deconv4, bconv41, aconv41, upflow4], axis=3)

        flow4 = BiasedConv(flow_channels, 3, 1, activation=None, dtype=dt, name="flow4")(concat4)
        deconv3 = ResizeConv(ch(256), dtype=dt, name="deconv3")(concat4, hw(bconv31))
        upflow3 = ResizeConv(flow_channels, activation=None, dtype=dt, name="upflow3")(flow4, hw(bconv31))
        concat3 = jnp.concatenate([deconv3, bconv31, aconv31, upflow3], axis=3)

        flow3 = BiasedConv(flow_channels, 3, 1, activation=None, dtype=dt, name="flow3")(concat3)
        deconv2 = ResizeConv(ch(128), dtype=dt, name="deconv2")(concat3, hw(bconv2))
        upflow2 = ResizeConv(flow_channels, activation=None, dtype=dt, name="upflow2")(flow3, hw(bconv2))
        concat2 = jnp.concatenate([deconv2, bconv2, aconv2, upflow2], axis=3)

        flow2 = BiasedConv(flow_channels, 3, 1, activation=None, dtype=dt, name="flow2")(concat2)
        deconv1 = ResizeConv(ch(64), dtype=dt, name="deconv1")(concat2, hw(bconv1))
        upflow1 = ResizeConv(flow_channels, activation=None, dtype=dt, name="upflow1")(flow2, hw(bconv1))
        concat1 = jnp.concatenate([deconv1, bconv1, aconv1, upflow1], axis=3)

        flow1 = BiasedConv(flow_channels, 5, 1, activation=None, dtype=dt, name="flow1")(concat1)
        pred_flow = resize_bilinear(flow1.astype(jnp.float32), orig_hw)
        return pred_flow
