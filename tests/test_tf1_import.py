"""TF1 checkpoint import roundtrip: write a TF1-named checkpoint, restore it.

Creates tf.compat.v1 variables carrying the exact reference variable names
(MaskNet/..., FlownetS/..., pwcnet/...) with the framework's parameter
shapes, saves a TF1 bundle, and restores it through tf1_import — verifying
the complete name map and shape compatibility for the published checkpoints.
"""

import os

import numpy as np
import pytest

import jax

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train import AdversarialLearner
from unsupervised_detection_tpu.train import tf1_import

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def state():
    cfg = Config(img_height=32, img_width=64, reader_height=64,
                 reader_width=128, batch_size=2)
    learner = AdversarialLearner(cfg)
    return learner.init_state(jax.random.PRNGKey(0))


def _flat_with_names(tree, name_map):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, value in flat:
        keys = tuple(k.key for k in path)
        out[name_map[keys]] = np.asarray(value)
    return out


def test_tf1_checkpoint_roundtrip(state, tmp_path):
    rng = np.random.RandomState(0)

    gen_map = tf1_import.generator_name_map(state.gen_params, state.gen_stats)
    rec_map = tf1_import.recover_name_map(state.rec_params)
    pwc_map = tf1_import.pwc_name_map(state.pwc_params)

    named = {}
    named.update(_flat_with_names(state.gen_params, gen_map))
    named.update(_flat_with_names(state.gen_stats, gen_map))
    named.update(_flat_with_names(state.rec_params, rec_map))
    named.update(_flat_with_names(state.pwc_params, pwc_map))

    # unique names, one per parameter
    n_leaves = sum(
        len(jax.tree.leaves(t))
        for t in (state.gen_params, state.gen_stats, state.rec_params, state.pwc_params)
    )
    assert len(named) == n_leaves

    # Build a TF1 graph holding variables with these names and random values.
    values = {name: rng.randn(*arr.shape).astype(np.float32)
              for name, arr in named.items()}
    ckpt_prefix = str(tmp_path / "tf1_model.ckpt")
    graph = tf.Graph()
    with graph.as_default():
        tf_vars = {}
        for name, val in values.items():
            scope, var_name = name.rsplit("/", 1)
            with tf.compat.v1.variable_scope(scope):
                tf_vars[name] = tf.compat.v1.get_variable(
                    var_name, initializer=tf.constant(val)
                )
        saver = tf.compat.v1.train.Saver(var_list=tf_vars)
        with tf.compat.v1.Session(graph=graph) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, ckpt_prefix)

    assert tf1_import.is_tf_checkpoint(ckpt_prefix)

    restored = tf1_import.restore_tf1_full(ckpt_prefix, state)

    for tree, name_map in [
        (restored.gen_params, gen_map),
        (restored.gen_stats, gen_map),
        (restored.rec_params, rec_map),
        (restored.pwc_params, pwc_map),
    ]:
        got = _flat_with_names(tree, name_map)
        for name, arr in got.items():
            np.testing.assert_array_equal(arr, values[name], err_msg=name)


def test_generator_bn_name_order():
    # first top-level BN has no suffix, later ones count up in creation order
    assert tf1_import._gen_bn_scope("conv1") == "MaskNet//batch_normalization"
    assert tf1_import._gen_bn_scope("conv2_downsample") == "MaskNet//batch_normalization_1"
    assert tf1_import._gen_bn_scope("conv17") == "MaskNet//batch_normalization_14"
    assert (
        tf1_import._gen_bn_scope("conv13_upsample")
        == "MaskNet//conv13_upsample/batch_normalization"
    )
