"""Shared host-batch -> device-tensor feeding.

One jitted uint8->reader-resolution preprocess (reference preprocess_image /
preprocess_mask, davis2016_data_utils.py:86-99) shared by the learner,
evaluator, ensemble evaluator, and pretrainer. Raw-mode batches (uniform
frame size) are cast+resized on device; host-mode batches arrive already
preprocessed (data/loader.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear, resize_nearest
from ..parallel.mesh import data_sharding


class DeviceFeeder:
    """Jitted preprocessing bound to a mesh + reader resolution."""

    def __init__(self, mesh, reader_hw):
        self.shard = data_sharding(mesh)
        h, w = reader_hw

        def preprocess(img_raw):
            x = img_raw.astype(jnp.float32) / 255.0 - 0.5
            return resize_bilinear(x, (h, w))

        def preprocess_mask(gt_raw):
            m = gt_raw.astype(jnp.float32) / 255.0
            return resize_nearest(m, (h, w))

        self.preprocess = jax.jit(preprocess, in_shardings=self.shard,
                                  out_shardings=self.shard)
        self.preprocess_mask = jax.jit(preprocess_mask, in_shardings=self.shard,
                                       out_shardings=self.shard)

    def images(self, batch):
        """(img1, img2) at reader resolution on device."""
        if "img1_raw" in batch:
            img1 = self.preprocess(jax.device_put(batch["img1_raw"], self.shard))
            img2 = self.preprocess(jax.device_put(batch["img2_raw"], self.shard))
        else:
            img1 = jax.device_put(batch["img1"], self.shard)
            img2 = jax.device_put(batch["img2"], self.shard)
        return img1, img2

    def mask(self, batch):
        if "gt_raw" in batch:
            return self.preprocess_mask(jax.device_put(batch["gt_raw"], self.shard))
        return jax.device_put(batch["gt"], self.shard)
