"""Golden tests against the reference's ACTUAL code (not hand-rebuilt oracles).

Imports /root/reference/models/{nets.py, utils/convolution_utils.py,
PWCNet/model_pwcnet.py} verbatim (tests/reference_oracle.py), builds the real
TF1 graphs at the REAL pipeline resolutions, and

  (a) asserts the genuine tf.layers/variable_scope auto-generated variable
      names equal train/tf1_import.py's name map — de-risking loading the
      published checkpoints sight-unseen (adversarial_learner.py:326-331);
  (b) transplants our randomly-initialized weights into the reference graphs
      and matches forward outputs in fp32.

These tests caught a real bug: the reference passes `tf.name_scope(...) as
scope` strings into tf.variable_scope (adversarial_learner.py:99-131), which
double-slashes every MaskNet//... and FlownetS//... variable name.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train import tf1_import
from unsupervised_detection_tpu.train.objective import AdversarialObjective

pytest.importorskip("tensorflow")

from reference_oracle import load_reference_models  # noqa: E402

WORK_HW = (192, 384)    # generator/recover resolution (common_flags.py:6-7)
READER_HW = (384, 640)  # PWC resolution (davis2016_data_utils.py:86-91)


@pytest.fixture(scope="module")
def ref():
    return load_reference_models()


@pytest.fixture(scope="module")
def objective():
    cfg = Config(img_height=WORK_HW[0], img_width=WORK_HW[1],
                 reader_height=READER_HW[0], reader_width=READER_HW[1],
                 batch_size=1)
    return AdversarialObjective(cfg)


@pytest.fixture(scope="module")
def variables(objective):
    rng = jax.random.PRNGKey(123)
    r_gen, r_rec, r_pwc = jax.random.split(rng, 3)
    img_w = jnp.zeros((1, WORK_HW[0], WORK_HW[1], 3), jnp.float32)
    flow_w = jnp.zeros((1, WORK_HW[0], WORK_HW[1], 2), jnp.float32)
    mask_w = jnp.zeros((1, WORK_HW[0], WORK_HW[1], 1), jnp.float32)
    img_r = jnp.zeros((1, READER_HW[0], READER_HW[1], 3), jnp.float32)
    gen_vars = objective.generator.init(r_gen, img_w, flow_w)
    rec_vars = objective.recover.init(r_rec, img_w, flow_w, mask_w)
    pwc_vars = objective.pwc.init(r_pwc, img_r, img_r)
    # Randomize BN stats/affine so the BN path is actually exercised.
    rs = np.random.RandomState(7)
    jitter = lambda t: jax.tree.map(
        lambda x: jnp.asarray(
            np.asarray(x) + rs.uniform(-0.3, 0.3, np.asarray(x).shape).astype(np.float32)
        ), t)
    gen_vars = {"params": jitter(gen_vars["params"]),
                "batch_stats": jitter(gen_vars["batch_stats"])}
    return gen_vars, rec_vars, pwc_vars


def _mapped_names(tree, name_map):
    out = {}
    for path, value in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = tuple(k.key for k in path)
        out[name_map[keys]] = np.asarray(value, np.float32)
    return out


def _build_generator_graph(ref, batch=1):
    tf1 = ref.tf1
    g = tf1.Graph()
    with g.as_default():
        img = tf1.placeholder(tf1.float32, [batch, WORK_HW[0], WORK_HW[1], 3])
        flow = tf1.placeholder(tf1.float32, [batch, WORK_HW[0], WORK_HW[1], 2])
        # Exactly the reference call (adversarial_learner.py:99-107).
        with tf1.name_scope("MaskNet") as scope:
            mask = ref.nets.generator_net(images=img, flows=flow,
                                          training=False, scope=scope,
                                          reuse=False)
    return g, (img, flow), mask


def _build_recover_graph(ref, batch=1):
    tf1 = ref.tf1
    g = tf1.Graph()
    with g.as_default():
        img = tf1.placeholder(tf1.float32, [batch, WORK_HW[0], WORK_HW[1], 3])
        fm = tf1.placeholder(tf1.float32, [batch, WORK_HW[0], WORK_HW[1], 2])
        m = tf1.placeholder(tf1.float32, [batch, WORK_HW[0], WORK_HW[1], 1])
        # Exactly the reference call (adversarial_learner.py:113-118).
        with tf1.name_scope("FlownetS") as scope:
            out = ref.nets.recover_net(img, fm, mask=m, scope=scope, reuse=False)
    return g, (img, fm, m), out


def _build_pwc_graph(ref, batch=1):
    tf1 = ref.tf1
    g = tf1.Graph()
    with g.as_default():
        i1 = tf1.placeholder(tf1.float32, [batch, READER_HW[0], READER_HW[1], 3])
        i2 = tf1.placeholder(tf1.float32, [batch, READER_HW[0], READER_HW[1], 3])
        # Exactly the reference call (adversarial_learner.py:82-84).
        model = ref.pwcnet.ModelPWCNet()
        flow = model.predict_from_img_pairs(i1, i2)
    return g, (i1, i2), flow


def _graph_var_names(graph, ref):
    with graph.as_default():
        return {v.name[:-2] for v in ref.tf1.global_variables()}


def _run_with_weights(graph, ref, values, fetches, feeds):
    tf1 = ref.tf1
    with graph.as_default():
        assigns = []
        for v in tf1.global_variables():
            name = v.name[:-2]
            assert name in values, f"no transplant value for {name}"
            assigns.append(tf1.assign(v, values[name]))
        with tf1.Session(graph=graph) as sess:
            sess.run(assigns)
            return sess.run(fetches, feeds)


# --- (a) name-map validation against genuine auto-naming -------------------

def test_generator_names_match_reference_graph(ref, variables):
    gen_vars, _, _ = variables
    g, _, _ = _build_generator_graph(ref)
    want = _graph_var_names(g, ref)
    got = set(tf1_import.generator_name_map(
        gen_vars["params"], gen_vars["batch_stats"]).values())
    assert got == want, (sorted(got - want)[:5], sorted(want - got)[:5])


def test_recover_names_match_reference_graph(ref, variables):
    _, rec_vars, _ = variables
    g, _, _ = _build_recover_graph(ref)
    want = _graph_var_names(g, ref)
    got = set(tf1_import.recover_name_map(rec_vars["params"]).values())
    assert got == want, (sorted(got - want)[:5], sorted(want - got)[:5])


def test_pwc_names_match_reference_graph(ref, variables):
    _, _, pwc_vars = variables
    g, _, _ = _build_pwc_graph(ref)
    want = _graph_var_names(g, ref)
    got = set(tf1_import.pwc_name_map(pwc_vars["params"]).values())
    assert got == want, (sorted(got - want)[:5], sorted(want - got)[:5])


# --- (b) forward parity with transplanted weights ---------------------------

def test_generator_forward_matches_reference(ref, variables, objective):
    gen_vars, _, _ = variables
    name_map = tf1_import.generator_name_map(gen_vars["params"], gen_vars["batch_stats"])
    values = _mapped_names(gen_vars["params"], name_map)
    values.update(_mapped_names(gen_vars["batch_stats"], name_map))

    rs = np.random.RandomState(11)
    img = rs.uniform(-0.5, 0.5, (1, WORK_HW[0], WORK_HW[1], 3)).astype(np.float32)
    flow = rs.randn(1, WORK_HW[0], WORK_HW[1], 2).astype(np.float32)

    g, (pi, pf), mask_t = _build_generator_graph(ref)
    want = _run_with_weights(g, ref, values, mask_t, {pi: img, pf: flow})

    got = np.asarray(objective.generator.apply(
        gen_vars, jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=3e-5)


def test_recover_forward_matches_reference(ref, variables, objective):
    _, rec_vars, _ = variables
    name_map = tf1_import.recover_name_map(rec_vars["params"])
    values = _mapped_names(rec_vars["params"], name_map)

    rs = np.random.RandomState(12)
    img = rs.uniform(-0.5, 0.5, (1, WORK_HW[0], WORK_HW[1], 3)).astype(np.float32)
    mask = rs.rand(1, WORK_HW[0], WORK_HW[1], 1).astype(np.float32)
    flow = rs.randn(1, WORK_HW[0], WORK_HW[1], 2).astype(np.float32)
    flow_masked = flow * (1.0 - mask)

    g, (pi, pfm, pm), out_t = _build_recover_graph(ref)
    want = _run_with_weights(g, ref, values, out_t,
                             {pi: img, pfm: flow_masked, pm: mask})

    got = np.asarray(objective.recover.apply(
        rec_vars, jnp.asarray(img), jnp.asarray(flow_masked), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_full_test_graph_composition_matches_reference(ref, variables, objective):
    """The COMPOSED production forward at the real widths: PWC at 384x640 ->
    tf.image.resize_images to 192x384 (vectors NOT rescaled) -> /80 ->
    per-image flow standardization -> generator mask
    (adversarial_learner.py:82-107). The individual modules are golden-tested
    above; this pins the full-path numerics including the 640-wide resize
    (the width where fp32 source-position rounding matters, ops/resize.py)
    and the standardize/normalize chain."""
    gen_vars, _, pwc_vars = variables
    values = _mapped_names(
        gen_vars["params"],
        tf1_import.generator_name_map(gen_vars["params"], gen_vars["batch_stats"]))
    values.update(_mapped_names(
        gen_vars["batch_stats"],
        tf1_import.generator_name_map(gen_vars["params"], gen_vars["batch_stats"])))
    values.update(_mapped_names(pwc_vars["params"],
                                tf1_import.pwc_name_map(pwc_vars["params"])))

    rs = np.random.RandomState(21)

    def smooth(seed):
        base = rs.rand(1, READER_HW[0] // 8, READER_HW[1] // 8, 3).astype(np.float32)
        img = jax.image.resize(jnp.asarray(base), (1,) + READER_HW + (3,), "linear")
        return np.asarray(img) - 0.5

    img1, img2 = smooth(0), smooth(1)

    tf1 = ref.tf1
    g = tf1.Graph()
    with g.as_default():
        p1 = tf1.placeholder(tf1.float32, [1, READER_HW[0], READER_HW[1], 3])
        p2 = tf1.placeholder(tf1.float32, [1, READER_HW[0], READER_HW[1], 3])
        model = ref.pwcnet.ModelPWCNet()
        flow_t = model.predict_from_img_pairs(p1, p2)
        img_w = tf1.image.resize_images(p1, [WORK_HW[0], WORK_HW[1]])
        flow_w = tf1.image.resize_images(flow_t, [WORK_HW[0], WORK_HW[1]]) / 80.0
        with tf1.name_scope("MaskNet") as scope:
            mask_t = ref.nets.generator_net(
                images=img_w, flows=ref.flow_utils.preprocess_flow_batch(flow_w),
                training=False, scope=scope, reuse=False)
    want = _run_with_weights(g, ref, values, mask_t, {p1: img1, p2: img2})

    # Ours, eagerly (per-op dispatch keeps this 1-core-host test cheap).
    flow_j = objective.compute_flow(pwc_vars["params"],
                                    jnp.asarray(img1), jnp.asarray(img2))
    image, flow_n = objective.resize_to_working(jnp.asarray(img1), flow_j)
    got = np.asarray(objective.generate_mask(
        gen_vars["params"], gen_vars["batch_stats"], image, flow_n))

    assert got.shape == want.shape
    # Masks are post-softmax in [0,1]; tolerance absorbs the fp32 drift of a
    # 6-level coarse-to-fine flow feeding a standardized 17-conv generator.
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_pwc_forward_matches_reference(ref, variables, objective):
    _, _, pwc_vars = variables
    name_map = tf1_import.pwc_name_map(pwc_vars["params"])
    values = _mapped_names(pwc_vars["params"], name_map)

    rs = np.random.RandomState(13)
    # Smooth inputs (real images are smooth; avoids chaotic coarse-to-fine
    # divergence from pure noise while still exercising every op).
    def smooth(seed):
        base = rs.rand(1, READER_HW[0] // 8, READER_HW[1] // 8, 3).astype(np.float32)
        img = jax.image.resize(jnp.asarray(base), (1,) + READER_HW + (3,), "linear")
        return np.asarray(img) - 0.5

    img1, img2 = smooth(0), smooth(1)

    g, (p1, p2), flow_t = _build_pwc_graph(ref)
    want = _run_with_weights(g, ref, values, flow_t, {p1: img1, p2: img2})

    got = np.asarray(objective.pwc.apply(
        {"params": pwc_vars["params"]}, jnp.asarray(img1), jnp.asarray(img2)))
    assert got.shape == want.shape
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=2e-4)
