"""Pin train/optim.py's TF1-Adam semantics against tf.compat.v1 directly.

The subtle part is the SHARED bias-correction step: the reference creates one
AdamOptimizer and calls apply_gradients from it for two disjoint variable
sets (adversarial_learner.py:216-233); TF1 Adam's beta1_power/beta2_power
non-slot accumulators decay on EVERY apply. This test interleaves applies to
two variable sets exactly like the reference's 3:1 alternation and demands
elementwise agreement with adam_apply under the shared step — a per-net step
count is off by ~6% on the later updates and fails this tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from unsupervised_detection_tpu.train.optim import adam_apply, adam_init

tf_mod = pytest.importorskip("tensorflow")
tf1 = tf_mod.compat.v1

LR, B1, B2, EPS = 1e-4, 0.9, 0.999, 1e-8


def test_shared_step_matches_tf1_adam_interleaved():
    rs = np.random.RandomState(3)
    a0 = rs.randn(5, 7).astype(np.float32)
    b0 = rs.randn(11).astype(np.float32)
    # Fixed per-step gradients (8 steps: gen gen gen rec, x2 — 'a' plays the
    # generator, 'b' the recover).
    schedule = ["a", "a", "a", "b", "a", "a", "a", "b"]
    grads = {name: [rs.randn(*(a0 if name == "a" else b0).shape)
                    .astype(np.float32) * 0.3 for _ in range(len(schedule))]
             for name in ("a", "b")}

    # --- TF1 oracle: one optimizer, two apply ops ---------------------------
    g = tf1.Graph()
    with g.as_default():
        va = tf1.get_variable("va", initializer=a0)
        vb = tf1.get_variable("vb", initializer=b0)
        ga = tf1.placeholder(tf1.float32, a0.shape)
        gb = tf1.placeholder(tf1.float32, b0.shape)
        opt = tf1.train.AdamOptimizer(learning_rate=LR, beta1=B1, epsilon=EPS)
        apply_a = opt.apply_gradients([(ga, va)])
        apply_b = opt.apply_gradients([(gb, vb)])
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            for i, which in enumerate(schedule):
                if which == "a":
                    sess.run(apply_a, {ga: grads["a"][i]})
                else:
                    sess.run(apply_b, {gb: grads["b"][i]})
            tf_a, tf_b = sess.run([va, vb])

    # --- framework: adam_apply with the shared t ----------------------------
    pa, pb = jnp.asarray(a0), jnp.asarray(b0)
    oa, ob = adam_init(pa), adam_init(pb)
    for i, which in enumerate(schedule):
        t = oa.count + ob.count + 1
        if which == "a":
            pa, oa = adam_apply(jnp.asarray(grads["a"][i]), oa, pa, t,
                                LR, B1, B2, EPS)
        else:
            pb, ob = adam_apply(jnp.asarray(grads["b"][i]), ob, pb, t,
                                LR, B1, B2, EPS)

    # fp32 order-of-operations noise only (~3e-7 on O(1) params).
    np.testing.assert_allclose(np.asarray(pa), tf_a, rtol=0, atol=5e-7)
    np.testing.assert_allclose(np.asarray(pb), tf_b, rtol=0, atol=5e-7)

    # Sanity: a per-net step count does NOT reproduce TF — the quirk is real.
    pa2 = jnp.asarray(a0)
    oa2 = adam_init(pa2)
    for i, which in enumerate(schedule):
        if which == "a":
            pa2, oa2 = adam_apply(jnp.asarray(grads["a"][i]), oa2, pa2,
                                  oa2.count + 1, LR, B1, B2, EPS)
    assert np.abs(np.asarray(pa2) - tf_a).max() > 5e-6
