"""Segmentation metrics: IoU, MAE, and foreground/background disambiguation.

The adversarial objective is symmetric in mask vs. complement, so evaluation
first decides which side is the moving object using a border-occupancy
heuristic (reference: models/utils/general_utils.py:89-151,
test_generator.py:19-40): the mask occupying less than 60% of a 2-pixel
border strip is declared foreground. All functions are pure, jittable, and
batched (vs. the reference's per-image numpy loops).
"""

from __future__ import annotations

import jax.numpy as jnp

BORDER_THRESHOLD = 0.6
MASK_THRESHOLD = 0.1
GT_THRESHOLD = 0.01


def boundary_score(masks):
    """Fraction of the 2-pixel image border occupied by the mask.

    Args:
        masks: (B, H, W, 1) binary (0/1) float masks.
    Returns:
        (B,) border occupancy in [0, 1].

    Note: the reference's TF (general_utils.py:134-150) and numpy
    (general_utils.py:117-132) variants both normalize by 4H + 4W — the sum
    of the four 2-pixel strip areas, counting corner pixels twice — so one
    batched implementation serves both the train-time and eval-time paths.
    """
    h, w = masks.shape[1], masks.shape[2]
    top = jnp.sum(masks[:, 0:2], axis=(1, 2, 3))
    bottom = jnp.sum(masks[:, h - 2 : h], axis=(1, 2, 3))
    left = jnp.sum(masks[:, :, 0:2], axis=(1, 2, 3))
    right = jnp.sum(masks[:, :, w - 2 : w], axis=(1, 2, 3))
    return (top + bottom + left + right) / (4.0 * w + 4.0 * h)


def disambiguate_forward_background(pred_masks, threshold: float = MASK_THRESHOLD):
    """Pick mask or complement as foreground by border occupancy.

    Args:
        pred_masks: (B, H, W, 1) soft masks in [0, 1].
    Returns:
        (B, H, W, 1) binary foreground masks.
    """
    binary = (pred_masks > threshold).astype(jnp.float32)
    scores = boundary_score(binary)
    keep = (scores < BORDER_THRESHOLD).astype(jnp.float32)[:, None, None, None]
    return keep * binary + (1.0 - keep) * (1.0 - binary)


def iou(gt_masks, pred_masks, epsilon: float = 1e-8):
    """Per-sample intersection-over-union of boolean masks.

    Args:
        gt_masks, pred_masks: (B, H, W, 1), boolean or {0,1} float.
    Returns:
        (B,) IoU with +epsilon in the denominator (reference
        tf_iou_computation, general_utils.py:89-98).
    """
    gt = gt_masks.astype(bool)
    pred = pred_masks.astype(bool)
    union = jnp.sum((gt | pred).astype(jnp.float32), axis=(1, 2, 3)) + epsilon
    inter = jnp.sum((gt & pred).astype(jnp.float32), axis=(1, 2, 3))
    return inter / union


def compute_all_iou(pred_masks, gt_masks, threshold: float = MASK_THRESHOLD):
    """Validation IoU: disambiguate fg/bg then IoU vs GT > 0.01
    (general_utils.py:111-115)."""
    gt = gt_masks > GT_THRESHOLD
    obj = disambiguate_forward_background(pred_masks, threshold)
    return iou(gt_masks=gt, pred_masks=obj)


def mae(gt_mask, pred_mask):
    """Mean absolute error between masks (test_generator.py:38-40)."""
    return jnp.mean(jnp.abs(gt_mask - pred_mask))


def eval_iou_mae(pred_masks, gt_masks, threshold: float = MASK_THRESHOLD):
    """Exact on-device replica of the reference eval metrics.

    Mirrors test_generator.py:19-40 (compute_IoU + compute_mae) per sample:
    binarize at `threshold`, flip to the complement when the mask occupies
    >= 60% of the 2-pixel border, GT truthiness is `astype(bool)` (any
    nonzero pixel), IoU = 1.0 when prediction and GT are BOTH empty, and
    MAE between the soft GT and the binary annotation. Lets evaluation
    fetch two scalars per frame instead of five dense tensors.

    Args:
        pred_masks: (B, H, W, 1) soft masks in [0, 1].
        gt_masks: (B, H, W, 1) soft GT in [0, 1].
    Returns:
        (iou, mae): each (B,) float32.
    """
    ann = disambiguate_forward_background(pred_masks, threshold)
    ann_b = ann > 0.5
    gt_b = gt_masks.astype(bool)
    inter = jnp.sum((ann_b & gt_b).astype(jnp.float32), axis=(1, 2, 3))
    union = jnp.sum((ann_b | gt_b).astype(jnp.float32), axis=(1, 2, 3))
    iou_b = jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1.0))
    mae_b = jnp.mean(jnp.abs(gt_masks.astype(jnp.float32) - ann),
                     axis=(1, 2, 3))
    return iou_b, mae_b
