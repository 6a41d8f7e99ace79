"""The contextual-information-separation objective as pure functions.

Reproduces the loss construction of the reference learner
(models/adversarial_learner.py:72-204):

  flow   = PWC(I1, I2) at reader resolution, resized (vectors NOT rescaled —
           the reference keeps flow in reader-resolution pixel units,
           adversarial_learner.py:89-90) and divided by flow_normalizer;
  M      = G(I1, standardize(flow));         Mc = 1 - M
  F_hat  = R(I1, flow*(1-M), M)
  F_hatc = R(I1, flow*(1-Mc), Mc)
  F_img  = R(I1, 0, 1)                       (image-only prior)

  recover_loss   = (rho(F_hat,F,M) + rho(F_hatc,F,Mc) + rho(F_img,F,1)) / BHW
  generator_loss = mean(1 - rho(F_hat,F,M)/(rho(F_img,F,M)+eps))
                 + mean(1 - rho(F_hatc,F,Mc)/(rho(F_img,F,Mc)+eps))

with rho the per-sample masked Charbonnier sum (ops/losses.py). The
generator MINIMIZES generator_loss, i.e. maximizes the recover's normalized
error inside the mask: contextual information separation.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models import GeneratorNet, PWCNet, RecoverNet
from ..ops.flow import standardize_flow
from ..ops.losses import charbonnier_loss
from ..ops.metrics import compute_all_iou
from ..ops.resize import resize_bilinear, resize_bilinear_composed, resize_nearest


class ForwardOutputs(NamedTuple):
    losses: Dict[str, jnp.ndarray]
    image: jnp.ndarray
    flow: jnp.ndarray
    mask: jnp.ndarray
    flow_masked: jnp.ndarray
    pred_flow: jnp.ndarray
    pred_flow_compl: jnp.ndarray


class AdversarialObjective:
    """Binds the three networks and the config into pure loss functions.

    When `mesh` carries a model axis of size > 1, the PWC cost volume's
    (2r+1)^2 offset axis is shard-constrained along it (tensor parallelism
    over correlation shifts; ops/cost_volume.cost_volume docstring)."""

    def __init__(self, config: Config, mesh=None):
        self.config = config
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
        self.dtype = dtype
        self.generator = GeneratorNet(dtype=dtype)
        self.recover = RecoverNet(dtype=dtype)
        costvol_sharding = None
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # Batch dim unconstrained: it propagates from the inputs, and
            # a "data" constraint would reject batch-1 init traces.
            costvol_sharding = NamedSharding(
                mesh, P(None, "model", None, None))
        self.pwc = PWCNet(
            pyr_lvls=config.pwc_pyr_lvls,
            flow_pred_lvl=config.pwc_flow_pred_lvl,
            search_range=config.pwc_search_range,
            dtype=dtype,
            use_pallas_costvol=config.use_pallas,
            warp_method=config.warp_method,
            costvol_offset_sharding=costvol_sharding,
        )

    # --- network applications -------------------------------------------
    def compute_flow(self, pwc_params, img1, img2):
        """Frozen PWC flow (no gradients flow back).

        In the fused-resize mode (bf16 throughput path) the flow stays at
        quarter resolution; resize_to_working composes the x4 upsample with
        the working-resolution downsample into one exact matmul.

        With flow_resolution_divisor > 1 the flow net runs on downscaled
        frames (non-parity throughput option)."""
        d = self.config.flow_resolution_divisor
        if d > 1:
            size = (self.config.reader_height // d, self.config.reader_width // d)
            mult = 2**self.pwc.pyr_lvls
            assert size[0] % mult == 0 and size[1] % mult == 0, (size, mult)
            img1 = resize_bilinear(img1, size)
            img2 = resize_bilinear(img2, size)
        flow = self.pwc.apply(
            {"params": pwc_params}, img1, img2,
            upsample_output=not self.fuse_flow_resize,
        )
        return jax.lax.stop_gradient(flow)

    @property
    def fuse_flow_resize(self) -> bool:
        return self.dtype == jnp.bfloat16

    def resize_to_working(self, img1, flow):
        """Resize image & flow to the working resolution; normalize flow.

        Flow vectors intentionally keep reader-resolution pixel units
        (adversarial_learner.py:87-97)."""
        cfg = self.config
        d = cfg.flow_resolution_divisor
        size = (cfg.img_height, cfg.img_width)
        image = resize_bilinear(img1, size)
        if self.fuse_flow_resize:
            # quarter-res flow -> working res in one composed resize; the
            # reference's x4 magnitude upsample scale commutes with the
            # resize, and the d-fold resolution reduction is compensated so
            # flow values stay in reader-resolution pixel units.
            mid = (cfg.reader_height // d, cfg.reader_width // d)
            scale = 2**self.pwc.flow_pred_lvl * d
            flow = resize_bilinear_composed(flow, mid, size) * (scale / cfg.flow_normalizer)
        else:
            if d > 1:
                flow = flow * d
            flow = resize_bilinear(flow, size) / cfg.flow_normalizer
        return image, flow

    def generate_mask(self, gen_params, gen_stats, image, flow):
        return self.generator.apply(
            {"params": gen_params, "batch_stats": gen_stats},
            image, standardize_flow(flow),
        )

    # --- losses -----------------------------------------------------------
    def losses_from_flow(self, gen_params, gen_stats, rec_params, image, flow) -> ForwardOutputs:
        """All two-player losses given the working-resolution image & flow."""
        cfg = self.config
        mask = self.generate_mask(gen_params, gen_stats, image, flow)
        mask_c = 1.0 - mask

        flow_masked = flow * (1.0 - mask)
        flow_masked_c = flow * (1.0 - mask_c)

        rec = lambda fm, m: self.recover.apply({"params": rec_params}, image, fm, m)
        pred = rec(flow_masked, mask)
        pred_c = rec(flow_masked_c, mask_c)
        pred_img = rec(jnp.zeros_like(flow), jnp.ones_like(mask))

        cbn = cfg.cbn
        rec_loss = charbonnier_loss(flow, pred, mask, cbn)            # [B]
        rec_compl_loss = charbonnier_loss(flow, pred_c, mask_c, cbn)  # [B]
        image_prior = charbonnier_loss(flow, pred_img, jnp.ones_like(flow), cbn)

        num_pixels = cfg.img_width * cfg.img_height * image.shape[0]
        recover_loss = (
            jnp.sum(rec_loss) + jnp.sum(rec_compl_loss) + jnp.sum(image_prior)
        ) / num_pixels

        eps = cfg.epsilon
        den = charbonnier_loss(flow, pred_img, mask, cbn) + eps
        red_rate_object = jnp.mean(1.0 - rec_loss / den)
        den_c = charbonnier_loss(flow, pred_img, mask_c, cbn) + eps
        red_rate_compl = jnp.mean(1.0 - rec_compl_loss / den_c)
        generator_loss = red_rate_object + red_rate_compl

        losses = {
            "generator": generator_loss,
            "recover": recover_loss,
            "red_rate": red_rate_object,
            "red_rate_compl": red_rate_compl,
            "reconstruction_loss": rec_loss[0],
            "reconstruction_compl_loss": rec_compl_loss[0],
            "denominator_red_rate": den[0],
            "denominator_red_rate_compl": den_c[0],
        }
        return ForwardOutputs(
            losses=losses,
            image=image,
            flow=flow,
            mask=mask,
            flow_masked=flow_masked,
            pred_flow=pred * mask + flow * (1.0 - mask),
            pred_flow_compl=pred * mask_c + flow * (1.0 - mask_c),
        )

    def forward(self, gen_params, gen_stats, rec_params, pwc_params, img1, img2) -> ForwardOutputs:
        """Full train/val forward from reader-resolution frames."""
        flow = self.compute_flow(pwc_params, img1, img2)
        image, flow = self.resize_to_working(img1, flow)
        return self.losses_from_flow(gen_params, gen_stats, rec_params, image, flow)

    # --- validation -------------------------------------------------------
    def validation_iou(self, gen_params, gen_stats, pwc_params, img1, img2, gt_masks):
        """Sum of per-sample IoU on a validation batch
        (adversarial_learner.py:133-137)."""
        cfg = self.config
        flow = self.compute_flow(pwc_params, img1, img2)
        image, flow = self.resize_to_working(img1, flow)
        gt = resize_nearest(gt_masks, (cfg.img_height, cfg.img_width))
        mask = self.generate_mask(gen_params, gen_stats, image, flow)
        return compute_all_iou(pred_masks=mask, gt_masks=gt)
