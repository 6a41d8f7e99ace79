"""Native coarse2fine flow: build, run, and accuracy on known motion."""

import numpy as np
import pytest

pyflow = pytest.importorskip("unsupervised_detection_tpu.native.pyflow")


def _shifted_pair(shift_x=3, shift_y=1, hw=(64, 96), seed=0):
    rng = np.random.RandomState(seed)
    big = rng.rand(hw[0] + 16, hw[1] + 16, 3)
    # smooth the texture so the variational solver has gradients to work with
    import cv2

    big = cv2.GaussianBlur(big.astype(np.float32), (7, 7), 2).astype(np.float64)
    im1 = big[8 : 8 + hw[0], 8 : 8 + hw[1]]
    im2 = big[8 - shift_y : 8 - shift_y + hw[0], 8 - shift_x : 8 - shift_x + hw[1]]
    return im1, im2


def test_translation_recovered():
    im1, im2 = _shifted_pair(shift_x=3, shift_y=1)
    u, v, warped = pyflow.coarse2fine_flow(im1, im2)
    # interior median flow should match the true translation
    interior_u = np.median(u[16:-16, 16:-16])
    interior_v = np.median(v[16:-16, 16:-16])
    assert abs(interior_u - 3.0) < 0.75, interior_u
    assert abs(interior_v - 1.0) < 0.75, interior_v
    # warped im2 should align with im1
    err = np.abs(warped[16:-16, 16:-16] - im1[16:-16, 16:-16]).mean()
    base = np.abs(im2[16:-16, 16:-16] - im1[16:-16, 16:-16]).mean()
    assert err < base * 0.5, (err, base)


def test_zero_motion_flow_near_zero():
    im1, _ = _shifted_pair()
    u, v, _ = pyflow.coarse2fine_flow(im1, im1)
    assert np.abs(u).max() < 0.3
    assert np.abs(v).max() < 0.3


def test_grayscale_input():
    im1, im2 = _shifted_pair(shift_x=2, shift_y=0)
    g1 = im1.mean(axis=2)
    g2 = im2.mean(axis=2)
    u, v, warped = pyflow.coarse2fine_flow(g1, g2, col_type=1)
    assert u.shape == g1.shape
    assert abs(np.median(u[16:-16, 16:-16]) - 2.0) < 0.75
