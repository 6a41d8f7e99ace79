"""TF1 checkpoint export: write this framework's params as a reference bundle.

The inverse of train/tf1_import.py — serializes a TrainState (or individual
scopes) into a TF1 checkpoint with the reference's exact variable names
(incl. the MaskNet// and FlownetS// double-slash quirk, see tf1_import),
so a model trained in this framework can be evaluated by the reference's
own test_generator.py / test_generator_ensemble.py unchanged
(adversarial_learner.py:326-331 — its saver restores all trainables from
one file, with pwcnet weights embedded).

Requires tensorflow at call time (optional dependency: only the interop
utility needs it; the TPU training/inference paths never import TF).
Kernel layouts match by construction (tf1_import module docstring), so the
export is a pure rename + save.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from . import tf1_import


def _named_values(state) -> Dict[str, np.ndarray]:
    values: Dict[str, np.ndarray] = {}
    pairs = [
        (state.gen_params,
         tf1_import.generator_name_map(state.gen_params, state.gen_stats)),
        (state.gen_stats,
         tf1_import.generator_name_map(state.gen_params, state.gen_stats)),
        (state.rec_params, tf1_import.recover_name_map(state.rec_params)),
        (state.pwc_params, tf1_import.pwc_name_map(state.pwc_params)),
    ]
    for tree, name_map in pairs:
        for path, value in jax.tree_util.tree_flatten_with_path(tree)[0]:
            keys = tuple(k.key for k in path)
            values[name_map[keys]] = np.asarray(value, np.float32)
    return values


def export_tf1_checkpoint(state, path: str, global_step: int | None = None) -> str:
    """Write `state` as a TF1 checkpoint at `path` (returns the ckpt prefix).

    The bundle contains every variable the reference's test-time saver
    expects (MaskNet// + FlownetS// + pwcnet scopes, plus global_step —
    test_generator.py:45 restores trainables; train-time resume also reads
    global_step, adversarial_learner.py:326)."""
    import tensorflow as tf

    tf1 = tf.compat.v1
    values = _named_values(state)
    if global_step is None:
        global_step = int(np.asarray(state.step))

    graph = tf1.Graph()
    with graph.as_default():
        tf_vars = []
        for name, value in sorted(values.items()):
            tf_vars.append(tf1.get_variable(
                name, shape=value.shape, dtype=tf1.float32,
                initializer=tf1.constant_initializer(value)))
        tf_vars.append(tf1.get_variable(
            "global_step", shape=(), dtype=tf1.int64,
            initializer=tf1.constant_initializer(global_step)))
        saver = tf1.train.Saver(var_list=tf_vars)
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            return saver.save(sess, path, write_meta_graph=False)
