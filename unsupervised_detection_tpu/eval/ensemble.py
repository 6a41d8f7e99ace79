"""Multi-crop ensemble inference (the aug_test path).

The reference builds four parallel per-crop subgraphs at batch size 1
(build_aug_test_graph, adversarial_learner.py:525-592). TPU-native redesign:
the crop axis IS a batch axis — the four central crops are four fused
crop+resize matmuls whose outputs are stacked into one 4B batch for a single
PWC + generator forward. One compiled function, full MXU utilization, and
the ensemble axis can shard across chips like any batch.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.device_input import DeviceFeeder
from ..ops.resize import central_crop_resize, resize_nearest
from ..parallel.mesh import data_sharding, make_mesh, replicate
from ..train.objective import AdversarialObjective

TEST_CROPS = [0.85, 0.9, 0.95, 1.0]  # adversarial_learner.py:531


class EnsembleEvaluator:
    """Jitted 4-crop ensemble forward."""

    def __init__(self, config: Config, mesh=None, test_crops: List[float] = None):
        self.config = config
        self.test_crops = list(test_crops or TEST_CROPS)
        self.mesh = mesh if mesh is not None else make_mesh(
            n_data=config.mesh_data or None, n_model=config.mesh_model,
            batch_size=config.batch_size,
        )
        self.objective = AdversarialObjective(config, mesh=self.mesh)
        self._build()

    def _build(self):
        cfg = self.config
        obj = self.objective
        crops = self.test_crops

        def infer(gen_params, gen_stats, pwc_params, img1, img2, gt):
            b = img1.shape[0]
            # Crop axis -> batch axis: stack the four cropped variants.
            img1_c = jnp.concatenate([central_crop_resize(img1, c) for c in crops])
            img2_c = jnp.concatenate([central_crop_resize(img2, c) for c in crops])
            gt_c = jnp.concatenate([central_crop_resize(gt, c) for c in crops])

            flow = obj.compute_flow(pwc_params, img1_c, img2_c)
            image, flow = obj.resize_to_working(img1_c, flow)
            gt_w = resize_nearest(gt_c, (cfg.img_height, cfg.img_width))
            mask = obj.generate_mask(gen_params, gen_stats, image, flow)

            def split(x):
                return x.reshape((len(crops), b) + x.shape[1:])

            return {
                "pred_masks": split(mask),
                "gt_masks": split(gt_w),
                "img_1s": split(image),
            }

        shard = data_sharding(self.mesh)
        repl = replicate(self.mesh)
        self.infer = jax.jit(
            infer,
            in_shardings=(repl, repl, repl, shard, shard, shard),
            out_shardings=repl,
        )
        self.feeder = DeviceFeeder(self.mesh, (cfg.reader_height, cfg.reader_width))

    def run(self, state, batch) -> Dict[str, np.ndarray]:
        """Run the 4-crop ensemble for one batch of uncropped test samples.

        Note: the ensemble path intentionally ignores config.test_crop; the
        reference feeds test_crop=1.0 inputs and applies the crop grid
        (adversarial_learner.py:536-550).
        """
        img1, img2 = self.feeder.images(batch)
        gt = self.feeder.mask(batch)
        out = self.infer(
            state.gen_params, state.gen_stats, state.pwc_params, img1, img2, gt
        )
        return jax.tree.map(np.asarray, out)
