"""Golden network-parity tests vs TF1 oracles.

Reconstructs the reference layer schedules (models/nets.py,
models/PWCNet/model_pwcnet.py) with tf.compat.v1 ops as independent oracles,
transplants our randomly initialized weights into them through the TF1 name
map (train/tf1_import.py), and compares forward outputs. This validates at
once: conv padding, BN semantics, activation alphas, resize kernels, the
softmax head, the cost volume, warping, and the name map itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train import AdversarialLearner, tf1_import

tf = pytest.importorskip("tensorflow")
tf1 = tf.compat.v1


@pytest.fixture(scope="module")
def state():
    cfg = Config(img_height=32, img_width=64, reader_height=64,
                 reader_width=128, batch_size=2)
    learner = AdversarialLearner(cfg)
    s = learner.init_state(jax.random.PRNGKey(42))
    # randomize BN affine + stats so the BN path is actually exercised
    rng = np.random.RandomState(7)
    jitter = lambda t: jax.tree.map(
        lambda x: jnp.asarray(
            np.asarray(x) + rng.uniform(-0.3, 0.3, np.asarray(x).shape).astype(np.float32)
        ),
        t,
    )
    return s.replace(gen_params=jitter(s.gen_params), gen_stats=jitter(s.gen_stats))


def _named_values(state):
    values = {}
    for tree, name_map in [
        (state.gen_params, tf1_import.generator_name_map(state.gen_params, state.gen_stats)),
        (state.gen_stats, tf1_import.generator_name_map(state.gen_params, state.gen_stats)),
        (state.rec_params, tf1_import.recover_name_map(state.rec_params)),
        (state.pwc_params, tf1_import.pwc_name_map(state.pwc_params)),
    ]:
        for path, value in jax.tree_util.tree_flatten_with_path(tree)[0]:
            keys = tuple(k.key for k in path)
            values[name_map[keys]] = np.asarray(value)
    return values


def _tf_var(values, name):
    return tf.constant(values[name])


def _tf_conv(values, x, scope, stride=1, rate=1, bn_scope=None, act="elu"):
    """Oracle gen_conv: conv + inference-mode BN + activation."""
    k = _tf_var(values, scope + "/kernel")
    b = _tf_var(values, scope + "/bias")
    y = tf.nn.conv2d(x, k, strides=[1, stride, stride, 1], padding="SAME",
                     dilations=[1, rate, rate, 1]) + b
    if bn_scope is not None:
        gamma = _tf_var(values, bn_scope + "/gamma")
        beta = _tf_var(values, bn_scope + "/beta")
        mean = _tf_var(values, bn_scope + "/moving_mean")
        var = _tf_var(values, bn_scope + "/moving_variance")
        y = tf.nn.batch_normalization(y, mean, var, beta, gamma, 1e-3)
    if act == "elu":
        y = tf.nn.elu(y)
    elif act == "leaky02":
        y = tf.nn.leaky_relu(y, alpha=0.2)
    elif act == "leaky01":
        y = tf.nn.leaky_relu(y, alpha=0.1)
    return y


def _oracle_generator(values, images, flows):
    """Reference generator schedule (nets.py:4-42) as an eager-TF oracle."""
    x = tf.concat([images, flows], 3)
    P = tf1_import.GEN_PREFIX
    order = tf1_import._GEN_TOPLEVEL_BN_ORDER

    def bn(i):
        return P + "batch_normalization" + ("" if i == 0 else "_%d" % i)

    g = lambda x, name, i, stride=1, rate=1, act="elu": _tf_conv(
        values, x, P + name, stride, rate, bn(i), act)

    x0 = g(x, "conv1", 0, 1)
    x = g(x0, "conv2_downsample", 1, 2)
    x1 = g(x, "conv3", 2)
    x = g(x1, "conv4_downsample", 3, 2)
    x = g(x, "conv5", 4)
    x2 = g(x, "conv6", 5)
    x = g(x2, "conv7_atrous", 6, rate=2)
    x = g(x, "conv8_atrous", 7, rate=4)
    x = g(x, "conv9_atrous", 8, rate=8)
    x = g(x, "conv10_atrous", 9, rate=16)
    x = g(x, "conv11", 10) + x2
    x = g(x, "conv12", 11)

    def up(x, name):
        h, w = x.shape[1], x.shape[2]
        x = tf1.image.resize_nearest_neighbor(x, (2 * h, 2 * w), align_corners=True)
        return _tf_conv(values, x, P + name + "/" + name + "_conv", 1, 1,
                        P + name + "/batch_normalization")

    x = up(x, "conv13_upsample")
    x = g(x, "conv14", 12) + x1
    x = up(x, "conv15_upsample") + x0
    x = g(x, "conv16", 13)
    x = g(x, "conv17", 14, act=None)
    x = x / 10.0
    return tf.nn.softmax(x, axis=-1)[..., 0:1]


def test_generator_matches_tf_oracle(state):
    values = _named_values(state)
    rng = np.random.RandomState(1)
    images = rng.uniform(-0.5, 0.5, (2, 32, 64, 3)).astype(np.float32)
    flows = rng.randn(2, 32, 64, 2).astype(np.float32)

    from unsupervised_detection_tpu.models import GeneratorNet

    gen = GeneratorNet()
    got = np.asarray(gen.apply(
        {"params": state.gen_params, "batch_stats": state.gen_stats},
        jnp.asarray(images), jnp.asarray(flows),
    ))
    want = _oracle_generator(values, tf.constant(images), tf.constant(flows)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def _oracle_recover(values, img1, flow_masked, mask):
    """Reference recover schedule (nets.py:45-110) as an eager-TF oracle."""
    P = tf1_import.REC_PREFIX

    def conv(x, name, stride=1, act="leaky02"):
        w = _tf_var(values, P + name + "/weights")
        b = _tf_var(values, P + name + "/biases")
        y = tf.nn.conv2d(x, w, strides=[1, stride, stride, 1], padding="SAME") + b
        if act == "leaky02":
            y = tf.nn.leaky_relu(y)
        return y

    def deconv(x, size, name, act="leaky02"):
        x = tf1.image.resize_images(x, size)
        return conv(x, name, 1, act)

    ones = tf.ones_like(flow_masked)[..., 0:1]
    flow_in = tf.concat([flow_masked, ones, 1.0 - mask], axis=3)

    a = {}
    x = img1
    for name, s in [("aconv1", 2), ("aconv2", 2), ("aconv3", 2), ("aconv31", 1),
                    ("aconv4", 2), ("aconv41", 1), ("aconv5", 2), ("aconv51", 1),
                    ("aconv6", 2)]:
        x = conv(x, name, s)
        a[name] = x
    b = {}
    x = flow_in
    for name, s in [("bconv1", 2), ("bconv2", 2), ("bconv3", 2), ("bconv31", 1),
                    ("bconv4", 2), ("bconv41", 1), ("bconv5", 2), ("bconv51", 1),
                    ("bconv6", 2)]:
        x = conv(x, name, s)
        b[name] = x

    conv6 = tf.concat([a["aconv6"], b["bconv6"]], 3)
    hw = lambda t: (t.shape[1], t.shape[2])

    deconv5 = deconv(conv6, hw(b["bconv51"]), "deconv5")
    concat5 = tf.concat([deconv5, b["bconv51"], a["aconv51"]], 3)
    flow5 = conv(concat5, "flow5", 1, act=None)
    deconv4 = deconv(concat5, hw(b["bconv41"]), "deconv4")
    upflow4 = deconv(flow5, hw(b["bconv41"]), "upflow4", act=None)
    concat4 = tf.concat([deconv4, b["bconv41"], a["aconv41"], upflow4], 3)
    flow4 = conv(concat4, "flow4", 1, act=None)
    deconv3 = deconv(concat4, hw(b["bconv31"]), "deconv3")
    upflow3 = deconv(flow4, hw(b["bconv31"]), "upflow3", act=None)
    concat3 = tf.concat([deconv3, b["bconv31"], a["aconv31"], upflow3], 3)
    flow3 = conv(concat3, "flow3", 1, act=None)
    deconv2 = deconv(concat3, hw(b["bconv2"]), "deconv2")
    upflow2 = deconv(flow3, hw(b["bconv2"]), "upflow2", act=None)
    concat2 = tf.concat([deconv2, b["bconv2"], a["aconv2"], upflow2], 3)
    flow2 = conv(concat2, "flow2", 1, act=None)
    deconv1 = deconv(concat2, hw(b["bconv1"]), "deconv1")
    upflow1 = deconv(flow2, hw(b["bconv1"]), "upflow1", act=None)
    concat1 = tf.concat([deconv1, b["bconv1"], a["aconv1"], upflow1], 3)
    flow1 = conv(concat1, "flow1", 1, act=None)
    return tf1.image.resize_images(flow1, hw(img1))


def test_recover_matches_tf_oracle(state):
    values = _named_values(state)
    rng = np.random.RandomState(2)
    img1 = rng.uniform(-0.5, 0.5, (2, 32, 64, 3)).astype(np.float32)
    flow = rng.randn(2, 32, 64, 2).astype(np.float32)
    mask = rng.rand(2, 32, 64, 1).astype(np.float32)
    flow_masked = flow * (1.0 - mask)

    from unsupervised_detection_tpu.models import RecoverNet

    rec = RecoverNet()
    got = np.asarray(rec.apply(
        {"params": state.rec_params},
        jnp.asarray(img1), jnp.asarray(flow_masked), jnp.asarray(mask),
    ))
    want = _oracle_recover(
        values, tf.constant(img1), tf.constant(flow_masked), tf.constant(mask)
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
