"""Loss primitives for the contextual-information-separation objective.

Masked Charbonnier penalty matching the reference
(models/utils/loss_utils.py:34-51): ((gt - pred)^2 + eps^2)^cbn summed over
all pixels/channels under the mask, returned per batch element.
"""

from __future__ import annotations

import jax.numpy as jnp

CHARBONNIER_EPSILON = 1e-3


def charbonnier_loss(gt_flows, pred_flows, masks, cbn: float = 0.5):
    """Per-sample masked Charbonnier penalty.

    Args:
        gt_flows: (B, H, W, C) target flow.
        pred_flows: (B, H, W, C) recovered flow.
        masks: broadcastable to (B, H, W, C); region over which the penalty
            counts (the generator's mask, its complement, or all-ones).
        cbn: Charbonnier power; 0.5 ~ L1, 1.0 ~ L2.

    Returns:
        (B,) sum of the masked penalty over pixels and channels.
    """
    diff = gt_flows - pred_flows
    penalty = jnp.power(diff * diff + CHARBONNIER_EPSILON**2, cbn)
    penalty = penalty * masks
    return jnp.sum(penalty, axis=(1, 2, 3))
