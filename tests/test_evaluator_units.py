"""Unit tests for evaluator metric helpers (reference test_generator.py)."""

import numpy as np

from unsupervised_detection_tpu.eval.evaluator import (
    compute_boundary_score_np,
    compute_iou_np,
    compute_mae_np,
)


def test_boundary_score_np():
    m = np.zeros((10, 20), bool)
    assert compute_boundary_score_np(m) == 0.0
    m[:] = True
    assert compute_boundary_score_np(m) == 1.0
    # top strip occupied: 40 px in the top strip + 4 px in each of the
    # left/right strips (corners double-count, as in the reference)
    m2 = np.zeros((10, 20), bool)
    m2[0:2] = True
    strips = 2 * 20 + 2 * 20 + 2 * 10 + 2 * 10
    assert compute_boundary_score_np(m2) == 48.0 / strips


def test_compute_iou_keeps_center_mask():
    gt = np.zeros((20, 30, 1), np.float32)
    gt[5:15, 10:20] = 1.0
    pred = gt * 0.8
    iou, annotation = compute_iou_np(gt, pred)
    assert iou == 1.0
    np.testing.assert_array_equal(annotation, gt.astype(bool))


def test_compute_iou_flips_border_heavy_mask():
    gt = np.zeros((20, 30, 1), np.float32)
    gt[5:15, 10:20] = 1.0
    pred = 1.0 - gt * 0.95  # background predicted as mask
    iou, annotation = compute_iou_np(gt, pred)
    assert iou == 1.0  # complement selected as foreground


def test_compute_iou_both_empty():
    z = np.zeros((8, 8, 1), np.float32)
    iou, annotation = compute_iou_np(z, z)
    assert iou == 1.0


def test_compute_mae():
    gt = np.zeros((4, 4, 1), np.float32)
    pred = np.ones((4, 4, 1), bool)
    assert compute_mae_np(gt, pred) == 1.0
