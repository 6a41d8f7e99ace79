"""Golden parity: full PWCNet forward vs a TF-conv + numpy-oracle composition.

The building blocks are each golden-tested elsewhere (convs vs TF, warp and
cost volume vs independent numpy oracles, transposed conv vs TF); this test
validates the coarse-to-fine WIRING of model_pwcnet.py:581-649 — level
order, the 20/2^lvl warp scalers, dense-connection concat order, context
residuals, learned upsampling, and the final x4 bilinear upsample/scale.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.models import PWCNet
from unsupervised_detection_tpu.train import tf1_import

tf = pytest.importorskip("tensorflow")
tf1 = tf.compat.v1


def _np_warp(image, flow):
    b, h, w, c = image.shape
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    qy = gy[None] - flow[..., 0]
    qx = gx[None] - flow[..., 1]
    fy = np.clip(np.floor(qy), 0, h - 2)
    fx = np.clip(np.floor(qx), 0, w - 2)
    ay = np.clip(qy - fy, 0, 1)[..., None]
    ax = np.clip(qx - fx, 0, 1)[..., None]
    iy = fy.astype(int)
    ix = fx.astype(int)
    bb = np.arange(b)[:, None, None]
    tl = image[bb, iy, ix]
    tr = image[bb, iy, ix + 1]
    bl = image[bb, iy + 1, ix]
    br = image[bb, iy + 1, ix + 1]
    top = tl + ax * (tr - tl)
    bot = bl + ax * (br - bl)
    return top + ay * (bot - top)


def _np_cost_volume(c1, warp, r=4):
    b, h, w, c = c1.shape
    padded = np.pad(warp, ((0, 0), (r, r), (r, r), (0, 0)))
    vols = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            s = padded[:, dy : dy + h, dx : dx + w, :]
            vols.append(np.mean(c1 * s, axis=3))
    vol = np.stack(vols, axis=3)
    return np.where(vol > 0, vol, 0.1 * vol).astype(np.float32)


def test_pwcnet_matches_hybrid_oracle():
    cfg = Config()
    model = PWCNet()
    rng_np = np.random.RandomState(0)
    h, w = 128, 192
    img1 = (rng_np.rand(1, h, w, 3).astype(np.float32) - 0.5)
    img2 = (rng_np.rand(1, h, w, 3).astype(np.float32) - 0.5)

    variables = model.init(jax.random.PRNGKey(3), jnp.asarray(img1), jnp.asarray(img2))
    params = variables["params"]
    got = np.asarray(model.apply(variables, jnp.asarray(img1), jnp.asarray(img2)))

    # name -> tensor via the TF1 name map
    values = {}
    for path, value in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(k.key for k in path)
        values[tf1_import.pwc_name_map(params)[keys]] = np.asarray(value)

    def conv(x, name, stride=1, rate=1, act=True):
        k = tf.constant(values[f"pwcnet/{name}/kernel"])
        b = tf.constant(values[f"pwcnet/{name}/bias"])
        y = tf.nn.conv2d(tf.constant(x), k, strides=[1, stride, stride, 1],
                         padding="SAME", dilations=[1, rate, rate, 1]) + b
        if act:
            y = tf.nn.leaky_relu(y, alpha=0.1)
        return y.numpy()

    def deconv(x, name):
        k = tf.constant(values[f"pwcnet/upsample/{name}/kernel"])
        b = tf.constant(values[f"pwcnet/upsample/{name}/bias"])
        n, hh, ww, _ = x.shape
        y = tf.nn.conv2d_transpose(
            tf.constant(x), k, output_shape=[n, hh * 2, ww * 2, k.shape[2]],
            strides=[1, 2, 2, 1], padding="SAME")
        return (y + b).numpy()

    def features(img):
        x = img + 0.5
        feats = [None]
        for lvl in range(1, 7):
            x = conv(x, f"featpyr/conv{lvl}a", stride=2)
            x = conv(x, f"featpyr/conv{lvl}aa")
            x = conv(x, f"featpyr/conv{lvl}b")
            feats.append(x)
        return feats

    c1 = features(img1)
    c2 = features(img2)

    up_flow = up_feat = None
    for lvl in range(6, 1, -1):
        if lvl == 6:
            x = _np_cost_volume(c1[lvl], c2[lvl])
        else:
            scaler = 20.0 / 2**lvl
            warped = _np_warp(c2[lvl], up_flow * scaler)
            corr = _np_cost_volume(c1[lvl], warped)
            x = np.concatenate([corr, c1[lvl], up_flow, up_feat], axis=3)
        for i, f in enumerate((128, 128, 96, 64, 32)):
            act = conv(x, f"predict_flow/conv{lvl}_{i}")
            x = np.concatenate([act, x], axis=3)
        upfeat = x
        flow = conv(upfeat, f"predict_flow/flow{lvl}", act=False)
        # context refinement
        y = upfeat
        for i, (f, rate) in enumerate(
            ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)), start=1
        ):
            y = conv(y, f"ctxt/dc_conv{lvl}{i}", rate=rate)
        y = conv(y, f"ctxt/dc_conv{lvl}7", act=False)
        flow = flow + y
        if lvl != 2:
            up_flow = deconv(flow, f"up_flow{lvl}")
            up_feat = deconv(upfeat, f"up_feat{lvl}")
        else:
            size = (flow.shape[1] * 4, flow.shape[2] * 4)
            want = tf1.image.resize_bilinear(tf.constant(flow), size).numpy() * 4

    # 2e-3 tolerance, justified by error propagation: the coarse-to-fine
    # recursion re-amplifies fp32 conv rounding at every level (flow is
    # upsampled x2 and used to WARP features, so a delta at level l+1
    # perturbs gather positions at level l — a Lipschitz-unbounded step),
    # across 6 levels x ~12 convs. The tight per-module bounds live in
    # test_reference_oracle.py (atol 2e-4 on normalized flow at the REAL
    # 384x640 resolution against the reference's verbatim code); this test
    # pins the coarse-to-fine WIRING, where the hybrid numpy oracle itself
    # accumulates independent rounding.
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
