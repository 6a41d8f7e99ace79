"""Orbax checkpointing with the reference's three-scope semantics.

The reference keeps three savers (adversarial_learner.py:326-331): the full
trainable set (written as `model-<epoch>` / `model.best`), the recover scope
(warm start from the FlyingChairs inpainting pretrain) and the pwcnet scope
(mandatory frozen flow weights). Here a checkpoint is one Orbax PyTree save
of the TrainState; scope restores are subtree loads into a freshly
initialized state. Saves are atomic and resumable (step + optimizer states +
PRNG key are all part of the tree).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

BEST_NAME = "model.best"


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(checkpoint_dir: str, name: str, state) -> str:
    """Save the full train state as `<checkpoint_dir>/<name>`."""
    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    # Materialize on host to keep the save independent of device layouts.
    host_state = jax.tree.map(np.asarray, state)
    _checkpointer().save(path, host_state, force=True)
    return path


MAX_TO_KEEP = 40  # reference saver: max_to_keep=40 (adversarial_learner.py:327)


def save_epoch(checkpoint_dir: str, epoch: int, state) -> str:
    path = save_checkpoint(checkpoint_dir, f"model-{epoch}", state)
    _prune_old(checkpoint_dir)
    return path


def _prune_old(checkpoint_dir: str, keep: int = MAX_TO_KEEP) -> None:
    """Drop the oldest model-<epoch> saves beyond `keep` (model.best and the
    scope saves are never pruned)."""
    import shutil

    epochs = []
    for entry in os.listdir(checkpoint_dir):
        if entry.startswith("model-"):
            try:
                epochs.append((int(entry.split("-")[1]), entry))
            except (IndexError, ValueError):
                continue
    epochs.sort()
    for _, entry in epochs[:-keep] if len(epochs) > keep else []:
        shutil.rmtree(os.path.join(checkpoint_dir, entry), ignore_errors=True)


def save_best(checkpoint_dir: str, state) -> str:
    return save_checkpoint(checkpoint_dir, BEST_NAME, state)


def restore_checkpoint(path: str, template):
    """Restore a full state saved by save_checkpoint, shaped like template."""
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.tree.map(np.asarray, template))
    restored = _checkpointer().restore(os.path.abspath(path), item=abstract)
    return jax.tree.map(lambda t, r: jax.numpy.asarray(r, dtype=np.asarray(t).dtype), template, restored)


def restore_params_scope(path: str, template, attr: str):
    """Restore one network's parameter subtree shaped like `template` from a
    checkpoint directory that may hold either a bare scope save (e.g.
    pretrain_flow.py's pwc-scope saves) or a full TrainState save (train.py's
    model-<epoch>/model.best, whose field `attr` holds the subtree). This is
    the native half of the dual-format contract in train/driver._restore_scope;
    callers without a TrainState (pretrain stages, tools) use it directly."""
    try:
        return restore_checkpoint(path, template)
    except Exception:
        # Full-state save: restore the raw tree (no template — Orbax returns
        # nested dicts keyed by the TrainState's field names) and extract.
        raw = _checkpointer().restore(os.path.abspath(path))
        if not isinstance(raw, dict) or attr not in raw:
            raise
        return jax.tree.map(
            lambda t, r: jax.numpy.asarray(r, dtype=np.asarray(t).dtype),
            template, raw[attr])


def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Most recent `model-<epoch>` save (reference resume logic,
    adversarial_learner.py:345-353)."""
    if not os.path.isdir(checkpoint_dir):
        return None
    best = None
    best_epoch = -1
    for entry in os.listdir(checkpoint_dir):
        if entry.startswith("model-"):
            try:
                epoch = int(entry.split("-")[1])
            except (IndexError, ValueError):
                continue
            if epoch > best_epoch:
                best_epoch = epoch
                best = os.path.join(checkpoint_dir, entry)
    return best


def checkpoint_exists(path: str) -> bool:
    return bool(path) and os.path.isdir(path)
