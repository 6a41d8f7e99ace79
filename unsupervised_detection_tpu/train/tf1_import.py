"""TF1 checkpoint import: maps reference variable names to flax params.

The published reference checkpoints are TF1 bundles with scopes
(adversarial_learner.py:326-331):
  * MaskNet/...  — generator convs + positionally-named batch_normalization
    variables (tf.layers auto-naming: first BN in a scope is
    "batch_normalization", then "_1", "_2", ... in creation order);
  * FlownetS/... — recover convs with "weights"/"biases" parameter names
    (convolution_utils.py:77-90);
  * pwcnet/...   — feature pyramid (featpyr), per-level estimators
    (predict_flow/conv{l}_{i}), context nets (ctxt/dc_conv{l}{i}) and
    transposed-conv upsamplers (upsample/up_flow{l}, up_feat{l}).

Kernel layouts transfer directly: TF conv kernels are HWIO (flax layout) and
TF conv2d_transpose kernels are [h, w, out, in] (our ConvTranspose2D stores
the same layout). Reading uses tf.train.load_checkpoint, which understands
TF1 bundles.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax

# The reference enters the MaskNet/FlownetS variable scopes by passing a
# `tf.name_scope(...) as scope` STRING (which ends in "/") into
# tf.variable_scope (adversarial_learner.py:99-131, nets.py:4,45). TF1 then
# concatenates another "/", so every variable in the published checkpoints
# is named "MaskNet//..." / "FlownetS//..." with a DOUBLE slash. Verified
# against the reference's actual graph code in
# tests/test_reference_oracle.py (genuine tf.compat.v1.layers auto-naming).
GEN_PREFIX = "MaskNet//"
REC_PREFIX = "FlownetS//"

# Creation order of the generator's top-level BN variables (nets.py:4-42);
# the upsample blocks open a fresh variable scope, so their BN counters
# restart and they are NOT in this list.
_GEN_TOPLEVEL_BN_ORDER = [
    "conv1", "conv2_downsample", "conv3", "conv4_downsample", "conv5",
    "conv6", "conv7_atrous", "conv8_atrous", "conv9_atrous", "conv10_atrous",
    "conv11", "conv12", "conv14", "conv16", "conv17",
]


def _gen_bn_scope(layer: str) -> str:
    if layer.endswith("_upsample"):
        return f"{GEN_PREFIX}{layer}/batch_normalization"
    i = _GEN_TOPLEVEL_BN_ORDER.index(layer)
    suffix = "" if i == 0 else f"_{i}"
    return f"{GEN_PREFIX}batch_normalization{suffix}"


_BN_PARAM = {"bn_gamma": "gamma", "bn_beta": "beta",
             "bn_moving_mean": "moving_mean", "bn_moving_variance": "moving_variance"}


def generator_name_map(params, stats) -> Dict[Tuple[str, ...], str]:
    """flax path -> TF1 variable name for the MaskNet scope."""
    mapping = {}

    def conv_names(layer, prefix):
        mapping[(layer,) + prefix + ("conv", "kernel")] = f"{GEN_PREFIX}{_conv_tf_name(layer)}/kernel"
        mapping[(layer,) + prefix + ("conv", "bias")] = f"{GEN_PREFIX}{_conv_tf_name(layer)}/bias"
        bn = _gen_bn_scope(layer)
        for ours, theirs in _BN_PARAM.items():
            mapping[(layer,) + prefix + (ours,)] = f"{bn}/{theirs}"

    def _conv_tf_name(layer):
        if layer.endswith("_upsample"):
            return f"{layer}/{layer}_conv"
        return layer

    for layer in _GEN_TOPLEVEL_BN_ORDER:
        conv_names(layer, ())
    for layer in ("conv13_upsample", "conv15_upsample"):
        conv_names(layer, ("conv",))
    return mapping


def recover_name_map(params) -> Dict[Tuple[str, ...], str]:
    """flax path -> TF1 variable name for the FlownetS scope."""
    mapping = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, _ in flat:
        keys = tuple(k.key for k in path)
        layer = keys[0]
        param = "weights" if keys[-1] == "kernel" else "biases"
        mapping[keys] = f"{REC_PREFIX}{layer}/{param}"
    return mapping


def pwc_name_map(params) -> Dict[Tuple[str, ...], str]:
    """flax path -> TF1 variable name for the pwcnet scope."""
    mapping = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, _ in flat:
        keys = tuple(k.key for k in path)
        top = keys[0]
        leaf = keys[-1]
        if top == "featpyr":
            mapping[keys] = f"pwcnet/featpyr/{keys[1]}/{leaf}"
        elif top.startswith("estimator"):
            mapping[keys] = f"pwcnet/predict_flow/{keys[1]}/{leaf}"
        elif top.startswith("ctxt"):
            mapping[keys] = f"pwcnet/ctxt/{keys[1]}/{leaf}"
        elif top.startswith("up_flow") or top.startswith("up_feat"):
            mapping[keys] = f"pwcnet/upsample/{top}/{leaf}"
        else:
            raise KeyError(f"Unmapped pwc param path {keys}")
    return mapping


def is_tf_checkpoint(path: str) -> bool:
    return os.path.isfile(path + ".index")


def _load_reader(path: str):
    import tensorflow as tf

    return tf.train.load_checkpoint(path)


def _fill(tree, mapping, reader, transform=None):
    """Replace tree leaves by checkpoint tensors per the name map."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, value in flat:
        keys = tuple(k.key for k in path)
        tf_name = mapping[keys]
        tensor = reader.get_tensor(tf_name)
        if transform is not None:
            tensor = transform(keys, tensor)
        assert tensor.shape == value.shape, (
            f"{tf_name}: checkpoint shape {tensor.shape} != param {value.shape}"
        )
        out.append(jax.numpy.asarray(tensor, dtype=value.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def restore_tf1_scope(path: str, state, scope: str):
    """Restore one scope (pwc / recover / gen / full) from a TF1 checkpoint."""
    reader = _load_reader(path)
    names = set(reader.get_variable_to_shape_map().keys())

    def has_scope(prefix):
        return any(n.startswith(prefix) for n in names)

    if scope in ("pwc", "full") and has_scope("pwcnet/"):
        state = state.replace(
            pwc_params=_fill(state.pwc_params, pwc_name_map(state.pwc_params), reader)
        )
    if scope in ("recover", "full") and has_scope("FlownetS/"):
        state = state.replace(
            rec_params=_fill(state.rec_params, recover_name_map(state.rec_params), reader)
        )
    if scope in ("gen", "full") and has_scope("MaskNet/"):
        gmap = generator_name_map(state.gen_params, state.gen_stats)
        state = state.replace(
            gen_params=_fill(state.gen_params, gmap, reader),
            gen_stats=_fill(state.gen_stats, gmap, reader),
        )
    if scope == "full" and "global_step" in names and hasattr(state, "step"):
        # The reference's full saver includes global_step
        # (adversarial_learner.py:326); resume semantics need it.
        state = state.replace(step=jax.numpy.asarray(
            reader.get_tensor("global_step"), dtype=state.step.dtype))
    return state


def restore_tf1_full(path: str, state):
    """Restore MaskNet + FlownetS + pwcnet from one TF1 checkpoint (the
    published trained models embed all three; test_generator.py:45-56)."""
    return restore_tf1_scope(path, state, "full")
