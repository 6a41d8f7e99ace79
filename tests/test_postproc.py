"""Post-processing tests: permutohedral filter, CRF, soft score, propagation."""

import numpy as np
import pytest

from unsupervised_detection_tpu.postproc.permutohedral import PermutohedralLattice
from unsupervised_detection_tpu.postproc.crf import dense_crf_binary, refine_mask
from unsupervised_detection_tpu.postproc.soft_score import (
    rectify_pred_mask,
    sanity_check,
)
from unsupervised_detection_tpu.postproc.propagate import (
    farneback_flow,
    propagate_masks,
    warp_with_flow,
)


def _brute_force_gaussian(feats, values):
    d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    k = np.exp(-0.5 * d2)
    return k @ values


def test_permutohedral_approximates_gaussian():
    rng = np.random.RandomState(0)
    n, d = 150, 3
    feats = rng.rand(n, d) * 4
    values = rng.rand(n, 2)
    lattice = PermutohedralLattice(feats)
    got = lattice.compute(values)
    want = _brute_force_gaussian(feats, values)
    # the lattice is an approximation of the Gaussian kernel; check strong
    # linear correlation rather than exact values
    for c in range(2):
        r = np.corrcoef(got[:, c], want[:, c])[0, 1]
        assert r > 0.97, r


def test_permutohedral_constant_preserved_up_to_scale():
    rng = np.random.RandomState(1)
    feats = rng.rand(200, 5) * 3
    ones = np.ones((200, 1))
    out = PermutohedralLattice(feats).compute(ones)
    # filtering a constant must stay (nearly) proportional to the local
    # kernel density — strictly positive and smooth
    assert (out > 0).all()


def test_dense_crf_sharpens_to_color_edges():
    # two-color image; noisy unary leaning the right way -> CRF should
    # recover the color split almost exactly
    h, w = 40, 60
    image = np.zeros((h, w, 3), np.uint8)
    image[:, : w // 2] = (250, 30, 30)
    image[:, w // 2 :] = (30, 30, 250)
    true = np.zeros((h, w))
    true[:, : w // 2] = 1.0
    rng = np.random.RandomState(2)
    noisy_p = np.clip(true * 0.7 + 0.15 + rng.rand(h, w) * 0.2, 1e-6, 1 - 1e-6)
    unary = -np.log(np.stack([1 - noisy_p, noisy_p]))
    q = dense_crf_binary(unary, image, sxy=10.0, srgb=5.0, compat=5.0,
                         n_iterations=10)
    labels = np.argmax(q, axis=0)
    accuracy = (labels == true).mean()
    assert accuracy > 0.98, accuracy


def test_refine_mask_returns_iou():
    h, w = 32, 48
    image = np.zeros((h, w, 3), np.uint8)
    image[8:24, 12:36] = (200, 50, 50)
    mask = np.zeros((h, w))
    mask[8:24, 12:36] = 0.9
    gt = (mask > 0.5).astype(np.float32)
    new_mask, iou = refine_mask(mask, image, 0.1, 10.0, 5.0, 5.0, gt)
    assert new_mask.shape == (h, w)
    assert iou is not None and iou > 0.8


def test_sanity_check_border_mass():
    m = np.ones((20, 30))
    assert sanity_check(m) == pytest.approx(1.0)
    m2 = np.zeros((20, 30))
    m2[8:12, 10:20] = 1.0
    assert sanity_check(m2) == 0.0


@pytest.mark.parametrize("ratio", [85 / 90.0, 95 / 90.0, 100 / 90.0, 1.0])
def test_rectify_pred_mask_shape_and_range(ratio):
    rng = np.random.RandomState(3)
    m = rng.rand(192, 384)
    out = rectify_pred_mask(m, ratio)
    assert out.shape == (192, 384)
    assert out.max() <= 1.0 + 1e-6 and out.min() >= 0.0


def test_warp_with_flow_identity():
    rng = np.random.RandomState(4)
    m = rng.rand(20, 30).astype(np.float32)
    u = np.zeros((20, 30))
    v = np.zeros((20, 30))
    np.testing.assert_allclose(warp_with_flow(m, u, v), m, atol=1e-6)


def test_warp_with_flow_shift():
    m = np.zeros((10, 10), np.float32)
    m[4, 4] = 1.0
    u = np.ones((10, 10))  # sample at x+1 -> shifts content left
    v = np.zeros((10, 10))
    out = warp_with_flow(m, u, v)
    assert out[4, 3] == pytest.approx(1.0)


def test_propagate_masks_tracks_motion():
    # a blob moving right; propagation should follow it
    rng = np.random.RandomState(5)
    frames, masks = [], []
    base = (rng.rand(40, 60, 3) * 80).astype(np.uint8)
    for t in range(5):
        img = base.copy()
        x = 10 + 5 * t
        img[15:25, x : x + 10] = (255, 60, 60)
        mask = np.zeros((40, 60))
        mask[15:25, x : x + 10] = 1.0
        frames.append(img)
        masks.append(mask)
    avgs = propagate_masks(masks, frames, flow_fn=farneback_flow)
    assert len(avgs) == 5
    # final running average should overlap the final mask region strongly
    overlap = (avgs[-1] * masks[-1]).sum() / masks[-1].sum()
    assert overlap > 0.4, overlap
    for a in avgs:
        assert np.isfinite(a).all()
        assert a.max() <= 1.0 + 1e-6


def test_native_crf_matches_numpy_engine():
    native = pytest.importorskip("unsupervised_detection_tpu.native.densecrf")
    h, w = 24, 32
    rng = np.random.RandomState(7)
    image = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    image[:, : w // 2] = (240, 40, 40)
    p = np.clip(rng.rand(h, w), 1e-6, 1 - 1e-6)
    unary = -np.log(np.stack([1 - p, p])).astype(np.float32)
    q_np = dense_crf_binary(unary, image, 8.0, 5.0, 3.0, n_iterations=5,
                            backend="numpy")
    q_cc = native.dense_crf_binary(unary, image, 8.0, 5.0, 3.0, n_iterations=5)
    # same lattice algorithm; small differences from float32 vs float64 math
    assert np.abs(q_cc - q_np).max() < 5e-2
    agree = (np.argmax(q_cc, 0) == np.argmax(q_np, 0)).mean()
    assert agree > 0.99, agree


def test_pwc_flow_backend_contract(tmp_path):
    """The on-device PWC propagation backend (post_processing.py
    --flow_backend=pwc): consumes a pretrain_flow.py checkpoint, honors the
    flow_fn contract (u, v on im_a's grid into im_b), reflect-pads frames
    whose size is not a multiple of 2**pyr_lvls, and drives
    propagate_masks end to end."""
    import jax

    from unsupervised_detection_tpu.config import Config
    from unsupervised_detection_tpu.postproc.propagate import pwc_flow_fn
    from unsupervised_detection_tpu.train import checkpoint as ckpt
    from unsupervised_detection_tpu.train.pretrain_pwc import pretrain_pwc

    ck_dir = str(tmp_path / "pwc")
    import os

    os.makedirs(ck_dir)
    cfg = Config(batch_size=2, reader_height=64, reader_width=64,
                 img_height=32, img_width=32, seed=0, checkpoint_dir=ck_dir)
    pretrain_pwc(cfg, steps=1, verbose=False, save_every=1)
    path = os.path.join(ck_dir, "pwc-final")
    assert ckpt.checkpoint_exists(path)

    flow_fn = pwc_flow_fn(path)
    rng = np.random.RandomState(0)
    # 48x80 is NOT divisible by 64 -> exercises the pad+crop path.
    frames = [rng.rand(48, 80, 3) for _ in range(3)]
    u, v = flow_fn(frames[0], frames[1])
    assert u.shape == (48, 80) and v.shape == (48, 80)
    assert np.isfinite(u).all() and np.isfinite(v).all()

    masks = [np.zeros((48, 80)) for _ in range(3)]
    for m in masks:
        m[10:20, 20:40] = 1.0
    avgs = propagate_masks(masks, frames, flow_fn=flow_fn)
    assert len(avgs) == 3 and all(np.isfinite(a).all() for a in avgs)


def test_scan_propagate_matches_host_loop():
    """The on-device lax.scan propagation equals the host cv2 loop given
    identical flows (the documented deviation is border handling only:
    clamp vs zero-fill — zero flow at the borders removes it)."""
    import jax.numpy as jnp

    from unsupervised_detection_tpu.postproc.propagate import (
        _ema_step,
        scan_propagate,
    )

    rng = np.random.RandomState(7)
    T, H, W = 4, 24, 32
    masks = rng.rand(T, H, W).astype(np.float32)
    flows = np.zeros((T - 1, H, W, 2), np.float32)
    # smooth interior-only flow, zero on a 4px frame border
    flows[..., 0] = 1.5
    flows[..., 1] = -0.75
    flows[:, :4] = flows[:, -4:] = 0.0
    flows[:, :, :4] = flows[:, :, -4:] = 0.0

    got = np.asarray(scan_propagate(jnp.asarray(masks), jnp.asarray(flows)))

    # host reference: same EMA recurrence with cv2.remap warps
    running = masks[0].astype(np.float64)
    want = [running]
    for t in range(1, T):
        u = flows[t - 1, ..., 0].astype(np.float64)
        v = flows[t - 1, ..., 1].astype(np.float64)
        running = _ema_step(masks[t - 1].astype(np.float64), running, u, v)
        want.append(running)

    np.testing.assert_allclose(got, np.stack(want), atol=2e-5)
