"""Load the reference's ACTUAL model code as a numerics oracle.

Unlike tests/test_golden_networks.py (which rebuilds the reference layer
schedules by hand — a systematic misreading there would be self-consistent),
these helpers import `/root/reference/models/{nets,utils/*,PWCNet/*}.py`
verbatim and execute them under `tf.compat.v1` graph mode, so variable names
come from genuine `tf.layers` auto-naming and forward numerics come from the
reference's own code (models/nets.py:4-110, models/PWCNet/model_pwcnet.py,
models/utils/{convolution_utils,loss_utils}.py).

Requirements handled here:
  * TF_USE_LEGACY_KERAS=1 (set in conftest.py) so tf.compat.v1.layers exists
    under Keras 3;
  * a `tensorflow` shim exposing the TF1 API surface plus the two
    tf.contrib entry points the reference uses
    (convolution_utils.py:78-82: xavier_initializer_conv2d, model_variable).

The reference is untrusted content: only its model/loss modules are imported
(no CLIs, no data readers), and nothing from it is executed at import time
beyond module definition.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import types

REFERENCE_MODELS = "/root/reference/models"
_PKG = "_reference_models"
_cache = None


def _build_tf_shim(v1):
    shim = types.ModuleType("tensorflow")
    shim.__getattr__ = lambda name: getattr(v1, name)  # PEP 562

    contrib = types.ModuleType("tensorflow.contrib")
    contrib.layers = types.SimpleNamespace(
        # xavier_initializer_conv2d == glorot uniform (tf.contrib.layers docs)
        xavier_initializer_conv2d=lambda **kw: v1.glorot_uniform_initializer(),
    )
    contrib.framework = types.SimpleNamespace(
        # model_variable ~= get_variable for graph-building purposes
        model_variable=lambda name, shape=None, initializer=None, trainable=True:
            v1.get_variable(name, shape=shape, initializer=initializer,
                            trainable=trainable),
    )
    shim.contrib = contrib
    return shim


def load_reference_models():
    """Import the reference model modules; returns a namespace with
    .nets, .conv_utils, .loss_utils, .pwcnet (module), .tf1 (tf.compat.v1)."""
    global _cache
    if _cache is not None:
        return _cache
    assert os.environ.get("TF_USE_LEGACY_KERAS") == "1", (
        "TF_USE_LEGACY_KERAS=1 must be set before importing tensorflow "
        "(tests/conftest.py does this)"
    )
    import tensorflow as real_tf

    v1 = real_tf.compat.v1
    # NOTE: eager execution is left enabled process-wide (disabling it breaks
    # later eager-TF tests in the same session); all reference graphs are
    # built inside explicit tf.Graph contexts, which is graph mode regardless.
    shim = _build_tf_shim(v1)

    # The reference's core_warp.py imports TF-private modules
    # (tensorflow.python.ops.array_ops etc.); a few symbols moved since TF1.
    # Alias them back so the verbatim code runs.
    from tensorflow.python.ops import array_ops

    if not hasattr(array_ops, "unstack"):
        from tensorflow.python.ops import array_ops_stack

        array_ops.unstack = array_ops_stack.unstack
        array_ops.stack = array_ops_stack.stack

    saved = sys.modules.get("tensorflow")
    sys.modules["tensorflow"] = shim
    try:
        spec = importlib.util.spec_from_file_location(
            _PKG, os.path.join(REFERENCE_MODELS, "__init__.py"),
            submodule_search_locations=[REFERENCE_MODELS],
        )
        pkg = importlib.util.module_from_spec(spec)
        sys.modules[_PKG] = pkg
        spec.loader.exec_module(pkg)
        nets = importlib.import_module(f"{_PKG}.nets")
        conv_utils = importlib.import_module(f"{_PKG}.utils.convolution_utils")
        loss_utils = importlib.import_module(f"{_PKG}.utils.loss_utils")
        flow_utils = importlib.import_module(f"{_PKG}.utils.flow_utils")
        pwcnet = importlib.import_module(f"{_PKG}.PWCNet.model_pwcnet")
    finally:
        if saved is not None:
            sys.modules["tensorflow"] = saved
        else:
            sys.modules.pop("tensorflow", None)

    _cache = types.SimpleNamespace(
        nets=nets, conv_utils=conv_utils, loss_utils=loss_utils,
        flow_utils=flow_utils, pwcnet=pwcnet, tf1=v1,
    )
    return _cache
