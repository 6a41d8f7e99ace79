"""Device mesh and sharding utilities.

The reference is strictly single-GPU (SURVEY.md section 2: no DP/TP/PP/SP of
any kind); this framework makes data parallelism a first-class property of
every jitted step instead. The design follows the standard TPU recipe:

  * one `jax.sharding.Mesh` over all local devices, axes ("data", "model");
  * batches are sharded along "data" (leading axis), parameters are
    replicated (the nets are ~1-9M params — far below the threshold where a
    "model" axis pays for itself, but the axis exists so larger variants can
    shard parameters without API changes);
  * gradients are reduced by XLA-inserted ICI all-reduces: the loss is a
    mean over the global batch, so `jax.grad` under a sharded-in jit emits
    the psum automatically — no hand-written collectives in the train step.

Multi-chip execution is validated on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`) in tests and via
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DEFAULT_DATA_AXIS = "data"
DEFAULT_MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None, batch_size: int | None = None) -> Mesh:
    """Create a ("data", "model") mesh over the available devices.

    Args:
        n_data: size of the data axis (defaults to len(devices) // n_model).
        n_model: size of the model axis (1 = pure data parallelism).
        devices: explicit device list (defaults to jax.devices()).
        batch_size: if given, shrink the data axis to the largest divisor of
            the batch (a batch that doesn't split evenly can't shard).
    """
    devices = list(devices if devices is not None else jax.devices())
    explicit = n_data is not None
    if n_data is None:
        n_data = len(devices) // n_model
    if batch_size is not None and not explicit:
        requested = n_data
        while n_data > 1 and batch_size % n_data != 0:
            n_data -= 1
        if n_data != requested:
            print("WARNING: batch_size=%d does not split over %d devices; "
                  "using a %d-device data axis (%d devices idle). Pick a "
                  "batch divisible by the device count for full utilization."
                  % (batch_size, requested, n_data, (requested - n_data) * n_model))
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, (DEFAULT_DATA_AXIS, DEFAULT_MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DEFAULT_DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) onto the mesh, batch-sharded.

    The leading axis of every leaf must be divisible by the data-axis size;
    eval pipelines keep batches full-size by wrapping the final ragged batch
    cyclically, exactly like the reference's drop_remainder-free test feed
    (see data/loader.py TestPipeline).
    """
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
