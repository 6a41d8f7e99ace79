"""PWCNet optical-flow backbone (frozen at train time).

Reproduces the reference configuration (models/PWCNet/model_pwcnet.py:8-19,
581-649): 6-level siamese feature pyramid (16/32/64/96/128/196 channels),
coarse-to-fine estimation with backward warping, a search-range-4 cost
volume, DenseNet-connected flow estimators (use_dense_cx), dilated context
refinement at every level (use_res_cx), learned transposed-conv upsampling of
flow and features between levels, and a final x4 bilinear upsample with a x4
flow magnitude scale. Prediction level = 2.

The cost volume and warping are the framework's Pallas-targeted ops
(ops/cost_volume.py, ops/warp.py); everything else is MXU convolutions.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.cost_volume import cost_volume
from ..ops.resize import resize_bilinear
from ..ops.warp import dense_image_warp
from .layers import ConvTranspose2D, PWCConv

PYRAMID_CHANNELS = (None, 16, 32, 64, 96, 128, 196)


class FeaturePyramid(nn.Module):
    """Siamese 6-level feature extractor (model_pwcnet.py:81-168).
    Called once per image; weights shared by construction."""

    pyr_lvls: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        for lvl in range(1, self.pyr_lvls + 1):
            f = PYRAMID_CHANNELS[lvl]
            x = PWCConv(f, 3, 2, dtype=self.dtype, name=f"conv{lvl}a")(x)
            x = PWCConv(f, 3, 1, dtype=self.dtype, name=f"conv{lvl}aa")(x)
            x = PWCConv(f, 3, 1, dtype=self.dtype, name=f"conv{lvl}b")(x)
            feats.append(x)
        return feats  # feats[i] is pyramid level i+1


class FlowEstimator(nn.Module):
    """Dense-connected optical-flow estimator head for one pyramid level
    (model_pwcnet.py:345-506, use_dense_cx=True).

    The DenseNet connectivity is carried as a LIST of channel parts (newest
    activation first) instead of growing concatenations: every conv consumes
    the list via kernel slices (models/layers._PartsConvCore), so the O(n^2)
    concat copies that dominated the round-1 TPU trace never materialize.
    Parameter tree and numerics (up to fp add order) are unchanged.
    """

    lvl: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_parts):
        parts = list(x_parts)
        for i, f in enumerate((128, 128, 96, 64, 32)):
            act = PWCConv(f, 3, 1, dtype=self.dtype, name=f"conv{self.lvl}_{i}")(parts)
            parts = [act] + parts
        flow = PWCConv(2, 3, 1, activation=None, dtype=self.dtype,
                       name=f"flow{self.lvl}")(parts)
        return parts, flow


class ContextNet(nn.Module):
    """Dilated context refinement (model_pwcnet.py:511-576, use_res_cx=True).
    `feat_parts` is the estimator's channel-parts list (logical concat)."""

    lvl: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_parts, flow):
        x = feat_parts
        dims = ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1))
        for i, (f, rate) in enumerate(dims, start=1):
            x = PWCConv(f, 3, 1, rate=rate, dtype=self.dtype, name=f"dc_conv{self.lvl}{i}")(x)
        x = PWCConv(2, 3, 1, rate=1, activation=None, dtype=self.dtype,
                    name=f"dc_conv{self.lvl}7")(x)
        return flow + x


class PWCNet(nn.Module):
    """Full coarse-to-fine flow network.

    Input images in the framework's [-0.5, 0.5] normalization (shifted to
    [0, 1] internally, matching adapt_x, model_pwcnet.py:39-56). Spatial size
    must be divisible by 2**pyr_lvls (640x384 in the reference pipeline).
    """

    pyr_lvls: int = 6
    flow_pred_lvl: int = 2
    search_range: int = 4
    dtype: jnp.dtype = jnp.float32
    use_pallas_costvol: bool = False
    # Warp gather formulation (ops/warp.py). "quad" pre-replicates the 2x2
    # tap patch so one gathered row carries all four taps; measured fastest
    # in-context once the estimator runs concat-free (tools/bench_split_conv.py:
    # 131.6 ms vs 138.2 flat at batch 32). Bit-identical tap math.
    warp_method: str = "quad"
    # Optional NamedSharding for the pre-transpose cost volume
    # [B, (2r+1)^2, H, W]; set by the learner/evaluator when the mesh has a
    # model axis > 1 to make the correlation offsets tensor-parallel
    # (ops/cost_volume.cost_volume docstring).
    costvol_offset_sharding: object = None

    @nn.compact
    def __call__(self, img1, img2, return_pyramid: bool = False,
                 upsample_output: bool = True):
        dt = self.dtype
        featpyr = FeaturePyramid(self.pyr_lvls, dtype=dt, name="featpyr")
        # One 2B-batch pyramid call instead of two siamese B-batch calls:
        # exact same math (convs are per-sample; no cross-batch ops), ~1.6x
        # faster on TPU (tools/bench_pwc_ablate.py: 11.8 -> 7.2 ms at B=32)
        # because the doubled matmul M-dim fills the MXU better.
        b = img1.shape[0]
        both = featpyr(jnp.concatenate(
            [(img1 + 0.5).astype(dt), (img2 + 0.5).astype(dt)], axis=0))
        c1 = [None] + [f[:b] for f in both]
        c2 = [None] + [f[b:] for f in both]

        flow_pyr = []
        up_flow = up_feat = None
        flow_pred = None
        for lvl in range(self.pyr_lvls, self.flow_pred_lvl - 1, -1):
            if lvl == self.pyr_lvls:
                corr = cost_volume(c1[lvl], c2[lvl], self.search_range,
                                   use_pallas=self.use_pallas_costvol,
                                   offset_sharding=self.costvol_offset_sharding)
                x = [corr]
            else:
                # Scale upsampled flow into this level's pixel units
                # (model_pwcnet.py:616: 20 / 2**lvl).
                scaler = 20.0 / 2**lvl
                warped = dense_image_warp(c2[lvl], up_flow * scaler,
                                          method=self.warp_method)
                corr = cost_volume(c1[lvl], warped, self.search_range,
                                   use_pallas=self.use_pallas_costvol,
                                   offset_sharding=self.costvol_offset_sharding)
                # Channel-parts list standing for the reference's
                # concat([corr, c1, up_flow, up_feat]) — never materialized.
                x = [corr, c1[lvl], up_flow, up_feat]

            upfeat, flow = FlowEstimator(lvl, dtype=dt, name=f"estimator{lvl}")(x)
            flow = ContextNet(lvl, dtype=dt, name=f"ctxt{lvl}")(upfeat, flow)
            flow_pyr.append(flow)

            if lvl != self.flow_pred_lvl:
                up_flow = ConvTranspose2D(2, 4, 2, dtype=dt, name=f"up_flow{lvl}")(flow)
                up_feat = ConvTranspose2D(2, 4, 2, dtype=dt, name=f"up_feat{lvl}")(upfeat)
            elif upsample_output:
                scaler = 2**self.flow_pred_lvl
                size = (flow.shape[1] * scaler, flow.shape[2] * scaler)
                flow_pred = resize_bilinear(flow.astype(jnp.float32), size) * scaler
            else:
                # Quarter-resolution flow; caller fuses the x4 upsample with
                # its own resize (ops/resize.resize_bilinear_composed) and
                # applies the x4 magnitude scale.
                flow_pred = flow.astype(jnp.float32)

        if return_pyramid:
            return flow_pred, flow_pyr
        return flow_pred
