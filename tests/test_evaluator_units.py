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


def test_eval_iou_mae_matches_numpy_reference():
    """The on-device metric path must agree per-frame with the numpy
    replica of test_generator.py:19-40 across the tricky regimes: normal
    masks, border-heavy masks (complement flip), both-empty, pred-empty,
    and soft (non-binary) GT."""
    from unsupervised_detection_tpu.ops.metrics import eval_iou_mae

    rng = np.random.RandomState(0)
    h, w = 24, 40
    batch = []
    # normal-ish random soft masks + binary gts
    for _ in range(4):
        batch.append((rng.rand(h, w, 1).astype(np.float32) * 0.5,
                      (rng.rand(h, w, 1) > 0.7).astype(np.float32)))
    # border-heavy prediction -> complement chosen as foreground
    border = np.ones((h, w, 1), np.float32) * 0.9
    border[8:16, 12:28] = 0.0
    gtc = np.zeros((h, w, 1), np.float32)
    gtc[8:16, 12:28] = 1.0
    batch.append((border, gtc))
    # both empty -> IoU 1.0
    batch.append((np.zeros((h, w, 1), np.float32),) * 2)
    # prediction empty, gt not -> IoU 0.0
    batch.append((np.zeros((h, w, 1), np.float32), gtc))
    # soft gt values (sparse FBMS-style annotations)
    batch.append((rng.rand(h, w, 1).astype(np.float32),
                  rng.rand(h, w, 1).astype(np.float32) * 0.3))

    preds = np.stack([p for p, _ in batch])
    gts = np.stack([g for _, g in batch])
    iou_d, mae_d = eval_iou_mae(preds, gts)
    iou_d, mae_d = np.asarray(iou_d), np.asarray(mae_d)
    for b in range(len(batch)):
        iou_np, ann = compute_iou_np(gt_mask=gts[b], pred_mask_f=preds[b])
        mae_np = compute_mae_np(gt_mask=gts[b], pred_mask=ann)
        np.testing.assert_allclose(iou_d[b], iou_np, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(mae_d[b], mae_np, rtol=1e-6, atol=1e-7)
