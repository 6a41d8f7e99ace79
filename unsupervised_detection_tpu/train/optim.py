"""TF1-compatible Adam with the reference's SHARED bias-correction step.

The reference constructs ONE `tf.train.AdamOptimizer` and calls
`apply_gradients` from it for both players (adversarial_learner.py:216-233).
TF1 Adam keeps its beta1^t / beta2^t bias-correction "power" accumulators as
per-INSTANCE non-slot variables, and `_finish()` decays them on EVERY
`apply_gradients` call — so the generator's and the recover's updates share
one global step count t. Under the 3:1 generator:recover alternation, after
N full cycles the powers are beta^(4N) for both nets, not beta^(3N) and
beta^(N). Early in training that changes the effective learning rate by up
to ~1.7x, so the framework reproduces it exactly (config.adam_shared_step
opts out, giving per-net counts).

Per-variable update (TF1 adam.py _apply_dense / training_ops ApplyAdam):

    m <- b1*m + (1-b1)*g
    v <- b2*v + (1-b2)*g^2
    lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
    p <- p - lr_t * m / (sqrt(v) + eps)

Note eps sits OUTSIDE the bias correction: optax.adam folds the correction
into m_hat/v_hat, which shifts eps by a sqrt(1-b2^t) factor — a real (if
small) numerical difference early on. We match TF bit-for-bit in fp32
(verified by tests/test_golden_train_dynamics.py against the reference's
actual loss graph + train_op).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class AdamState(struct.PyTreeNode):
    count: jnp.ndarray  # applies of THIS net's train op so far (int32)
    m: Any
    v: Any


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), m=zeros,
                     v=jax.tree.map(jnp.zeros_like, params))


def adam_apply(grads, opt: AdamState, params, t, lr, b1, b2, eps):
    """One Adam step with bias-correction step `t` (int scalar, >= 1).

    `t` is supplied by the caller because the reference shares it across the
    two players (module docstring); `opt.count` still tracks this net's own
    apply count.

    Returns (new_params, new_opt).
    """
    t = t.astype(jnp.float32) if isinstance(t, jnp.ndarray) else jnp.float32(t)
    lr_t = lr * jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
    m = jax.tree.map(lambda m_, g: b1 * m_ + (1.0 - b1) * g, opt.m, grads)
    v = jax.tree.map(lambda v_, g: b2 * v_ + (1.0 - b2) * g * g, opt.v, grads)
    new_params = jax.tree.map(
        lambda p, m_, v_: p - lr_t * m_ / (jnp.sqrt(v_) + eps), params, m, v
    )
    return new_params, AdamState(count=opt.count + 1, m=m, v=v)
