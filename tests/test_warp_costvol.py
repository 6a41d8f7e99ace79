"""Oracle tests for dense_image_warp and cost_volume.

Oracles are independent numpy implementations of the reference semantics
(models/PWCNet/core_warp.py:42-202, core_costvol.py:20-40); identity /
integer-shift sanity checks guard against convention slips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.ops.warp import dense_image_warp
from unsupervised_detection_tpu.ops.cost_volume import cost_volume


def _np_warp(image, flow):
    b, h, w, c = image.shape
    out = np.zeros_like(image)
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                qy = y - flow[bi, y, x, 0]
                qx = x - flow[bi, y, x, 1]
                fy = min(max(np.floor(qy), 0.0), h - 2)
                fx = min(max(np.floor(qx), 0.0), w - 2)
                ay = min(max(qy - fy, 0.0), 1.0)
                ax = min(max(qx - fx, 0.0), 1.0)
                fy, fx = int(fy), int(fx)
                tl = image[bi, fy, fx]
                tr = image[bi, fy, fx + 1]
                bl = image[bi, fy + 1, fx]
                br = image[bi, fy + 1, fx + 1]
                top = ax * (tr - tl) + tl
                bot = ax * (br - bl) + bl
                out[bi, y, x] = ay * (bot - top) + top
    return out


def _np_cost_volume(c1, warp, r):
    b, h, w, c = c1.shape
    padded = np.pad(warp, ((0, 0), (r, r), (r, r), (0, 0)))
    vols = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            s = padded[:, dy : dy + h, dx : dx + w, :]
            vols.append(np.mean(c1 * s, axis=3))
    vol = np.stack(vols, axis=3)
    return np.where(vol > 0, vol, 0.1 * vol)


def test_warp_zero_flow_is_identity():
    rng = np.random.RandomState(0)
    img = rng.randn(2, 8, 12, 3).astype(np.float32)
    out = np.asarray(dense_image_warp(jnp.asarray(img), jnp.zeros((2, 8, 12, 2))))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_warp_integer_shift():
    rng = np.random.RandomState(1)
    img = rng.randn(1, 8, 8, 1).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 1.0  # output(y) = input(y - 1)
    out = np.asarray(dense_image_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, 1:], img[0, :-1], atol=1e-6)


def test_warp_matches_oracle():
    rng = np.random.RandomState(2)
    img = rng.randn(2, 10, 14, 3).astype(np.float32)
    flow = (rng.randn(2, 10, 14, 2) * 3).astype(np.float32)
    out = np.asarray(dense_image_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, _np_warp(img, flow), rtol=1e-5, atol=1e-5)


def test_warp_matches_tf_dense_image_warp():
    tf = pytest.importorskip("tensorflow")
    # tfa is gone; TF keeps the same kernel under tf.raw_ops? Use the
    # reference formula oracle at fp32 already covered; cross-check the
    # gradient path instead: warp must be differentiable w.r.t. both inputs.
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    flow = jnp.asarray((rng.randn(1, 6, 6, 2) * 2).astype(np.float32))
    g_img, g_flow = jax.grad(
        lambda i, f: jnp.sum(dense_image_warp(i, f) ** 2), argnums=(0, 1)
    )(img, flow)
    assert np.isfinite(np.asarray(g_img)).all()
    assert np.isfinite(np.asarray(g_flow)).all()
    assert float(jnp.sum(jnp.abs(g_flow))) > 0.0


@pytest.mark.parametrize("r", [1, 4])
def test_cost_volume_matches_oracle(r):
    rng = np.random.RandomState(4)
    c1 = rng.randn(2, 6, 8, 16).astype(np.float32)
    c2 = rng.randn(2, 6, 8, 16).astype(np.float32)
    out = np.asarray(cost_volume(jnp.asarray(c1), jnp.asarray(c2), r))
    np.testing.assert_allclose(out, _np_cost_volume(c1, c2, r), rtol=1e-5, atol=1e-5)


def test_cost_volume_center_channel_is_self_correlation():
    rng = np.random.RandomState(5)
    c1 = rng.randn(1, 5, 5, 8).astype(np.float32)
    out = np.asarray(cost_volume(jnp.asarray(c1), jnp.asarray(c1), 4))
    center = out[..., 40]  # dy=dx=4 -> index 4*9+4
    want = np.mean(c1 * c1, axis=3)
    want = np.where(want > 0, want, 0.1 * want)
    np.testing.assert_allclose(center, want, rtol=1e-5, atol=1e-5)
