"""TF1 checkpoint export round-trip: our params -> TF1 bundle -> our params.

Complements tests/test_reference_oracle.py (which proves the name maps
match the reference's genuine auto-generated graph names): a bundle written
by tf1_export must restore bit-identically through the production import
path (tf1_import.restore_tf1_full), proving a model trained here can be
handed to the reference's own evaluation scripts."""

import os

import numpy as np
import pytest

import jax

from unsupervised_detection_tpu.config import Config
from unsupervised_detection_tpu.train import AdversarialLearner, tf1_import

pytest.importorskip("tensorflow")

from unsupervised_detection_tpu.train.tf1_export import export_tf1_checkpoint  # noqa: E402


def test_export_import_roundtrip(tmp_path):
    cfg = Config(img_height=32, img_width=64, reader_height=64,
                 reader_width=128, batch_size=2)
    learner = AdversarialLearner(cfg)
    state = learner.init_state(jax.random.PRNGKey(5))
    state = state.replace(step=state.step + 37)

    prefix = export_tf1_checkpoint(state, str(tmp_path / "export" / "model"))
    assert tf1_import.is_tf_checkpoint(prefix)

    fresh = learner.init_state(jax.random.PRNGKey(6))
    restored = tf1_import.restore_tf1_full(prefix, fresh)

    for name in ("gen_params", "gen_stats", "rec_params", "pwc_params"):
        want = jax.tree.leaves(getattr(state, name))
        got = jax.tree.leaves(getattr(restored, name))
        assert len(want) == len(got)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    assert int(np.asarray(restored.step)) == 37
