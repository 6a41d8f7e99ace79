"""Recipe-v3 PWC pretraining pieces: boundary-band weighting and the
deformable (sinusoidal-residual) scene distribution.

Round-4 context: the adversarial game's locked-regime IoU is bounded by
flow EPE in the ring around object edges (ROADMAP round-4 item 3 —
boundary EPE ~7.8 px at every recipe through v2). Recipe v3 upweights
that ring in the loss (train/pretrain_pwc.boundary_band) and adds
non-affine object motion to the scenes (tools/exp_scenes.make_scenes_v2
deform_amp) so the net trains on the discontinuity structure the game
evaluates on.
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train.pretrain_pwc import (
    boundary_band, multiscale_epe, pretrain_pwc)

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from exp_scenes import make_scenes_v2  # noqa: E402


def test_boundary_band_is_dilation_minus_erosion():
    """For a centered square, the band is exactly the pixels within
    `radius` (Chebyshev) of the edge — on both sides of it."""
    m = np.zeros((1, 16, 16, 1), np.float32)
    m[0, 5:11, 5:11, 0] = 1.0
    band = np.asarray(boundary_band(jnp.asarray(m), radius=2))
    assert set(np.unique(band)) <= {0.0, 1.0}
    # Inside the square but >radius from the edge: not in the band.
    assert band[0, 8, 8, 0] == 0.0
    # Just inside / just outside the edge: in the band.
    assert band[0, 5, 8, 0] == 1.0
    assert band[0, 4, 8, 0] == 1.0
    assert band[0, 12, 8, 0] == 1.0  # 2 px outside (rows 11, 12)
    assert band[0, 13, 8, 0] == 0.0  # 3 px outside
    # Far background: not in the band.
    assert band[0, 0, 0, 0] == 0.0
    # Uniform masks have no boundary.
    assert np.asarray(boundary_band(jnp.zeros((1, 8, 8, 1)))).max() == 0.0
    assert np.asarray(boundary_band(jnp.ones((1, 8, 8, 1)))).max() == 0.0


def test_multiscale_epe_weight_changes_loss_not_metric():
    """Upweighting a region where the prediction is wrong must raise the
    loss while leaving the returned (unweighted) EPE metric unchanged."""
    rs = np.random.RandomState(0)
    gt = jnp.asarray(rs.randn(1, 16, 32, 2).astype(np.float32))
    pred = gt.at[:, :8].add(2.0)  # error concentrated in the top half
    pyr = [gt[:, ::4, ::4] / 4.0]
    w = jnp.ones((1, 16, 32, 1)).at[:, :8].set(5.0)
    loss_u, epe_u = multiscale_epe(pred, pyr, gt)
    loss_w, epe_w = multiscale_epe(pred, pyr, gt, weight=w)
    assert float(epe_w) == float(epe_u)
    assert float(loss_w) > float(loss_u)


def test_pretrain_accepts_boundary_weight(tmp_path):
    """pretrain_pwc runs end-to-end with a 4-tuple batch_fn and
    boundary_weight set (the v3 path), producing finite losses."""
    cfg = Config(batch_size=2, reader_height=64, reader_width=64,
                 img_height=32, img_width=32, seed=0)
    make = make_scenes_v2(2, 64, 64, deform_amp=3.0)
    keybox = {"k": jax.random.PRNGKey(0)}

    def batches(_rng, _b, _h, _w):
        keybox["k"], k = jax.random.split(keybox["k"])
        img1, img2, flow80, gt = make(k)
        return img1, img2, flow80 * 80.0, gt

    _, epe = pretrain_pwc(cfg, steps=2, verbose=False, batch_fn=batches,
                          object_weight=4.0, boundary_weight=8.0)
    assert np.isfinite(epe)


def test_scenes_v3_deform_only_inside_objects():
    """The sinusoidal residual perturbs flow only where objects are; the
    background field is unchanged vs deform_amp=0 under the same key, and
    the object flow is genuinely non-affine (deformable)."""
    key = jax.random.PRNGKey(3)
    v2 = make_scenes_v2(2, 64, 96, deform_amp=0.0)
    v3 = make_scenes_v2(2, 64, 96, deform_amp=6.0)
    i1a, i2a, fa, ma = v2(key)
    i1b, i2b, fb, mb = v3(key)
    # Identical geometry/texture draw (the deform key is a 9th subkey that
    # does not perturb the first 8), so masks and first frames match.
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))
    np.testing.assert_array_equal(np.asarray(i1a), np.asarray(i1b))
    fa, fb, m = np.asarray(fa), np.asarray(fb), np.asarray(ma)
    # Background flow untouched; object flow perturbed.
    np.testing.assert_array_equal(fa[m[..., 0] == 0], fb[m[..., 0] == 0])
    diff = np.abs((fb - fa) * 80.0)[m[..., 0] == 1]
    assert diff.max() > 0.5, "deform residual missing inside objects"
    assert diff.max() <= 6.0 + 1e-3, "residual exceeds deform_amp"


def test_scenes_v2_default_unchanged():
    """deform_amp defaults to 0 and reproduces the original v2 stream —
    the committed pwc_ckpt_v2 arm's distribution must stay replayable."""
    key = jax.random.PRNGKey(11)
    a = make_scenes_v2(1, 32, 48)
    b = make_scenes_v2(1, 32, 48, deform_amp=0.0)
    for xa, xb in zip(a(key), b(key)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_multiscale_epe_weight_aux_decouples_final_from_aux_levels():
    """weight_aux replaces `weight` for the aux pyramid levels only (the
    round-5 fix for the v3 failure: a band weight must not be resized
    onto coarse levels). Verify by composition: loss(final=wb, aux=wo)
    == final-term(wb) + aux-terms(wo)."""
    rs = np.random.RandomState(1)
    gt = jnp.asarray(rs.randn(1, 16, 32, 2).astype(np.float32))
    pred = gt.at[:, 6:10].add(1.5)
    pyr = [gt[:, ::8, ::8] / 20.0, gt[:, ::4, ::4] / 4.0]
    wb = jnp.ones((1, 16, 32, 1)).at[:, 6:10].set(9.0)  # band-ish weight
    wo = jnp.ones((1, 16, 32, 1)).at[:, :, :16].set(5.0)  # object-ish
    mixed, _ = multiscale_epe(pred, pyr, gt, weight=wb, weight_aux=wo)
    final_wb, _ = multiscale_epe(pred, [], gt, weight=wb)
    final_wo, _ = multiscale_epe(pred, [], gt, weight=wo)
    both_wo, _ = multiscale_epe(pred, pyr, gt, weight=wo)
    np.testing.assert_allclose(float(mixed),
                               float(final_wb) + float(both_wo)
                               - float(final_wo), rtol=1e-6)


def test_pretrain_boundary_mode_plumbing():
    """boundary_mode="all" (the reproducible v3 killer) and "final" (the
    fixed default) both run; unknown modes are rejected."""
    cfg = Config(batch_size=2, reader_height=64, reader_width=64,
                 img_height=32, img_width=32, seed=0)
    make = make_scenes_v2(2, 64, 64, deform_amp=3.0)
    keybox = {"k": jax.random.PRNGKey(0)}

    def batches(_rng, _b, _h, _w):
        keybox["k"], k = jax.random.split(keybox["k"])
        img1, img2, flow80, gt = make(k)
        return img1, img2, flow80 * 80.0, gt

    for mode in ("final", "all"):
        _, epe = pretrain_pwc(cfg, steps=1, verbose=False, batch_fn=batches,
                              object_weight=4.0, boundary_weight=8.0,
                              boundary_mode=mode)
        assert np.isfinite(epe)
    try:
        pretrain_pwc(cfg, steps=1, verbose=False, batch_fn=batches,
                     boundary_weight=8.0, boundary_mode="bogus")
        raise AssertionError("bogus boundary_mode accepted")
    except ValueError:
        pass
