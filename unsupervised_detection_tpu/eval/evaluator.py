"""Batched, jitted evaluation — the test_generator path.

Reproduces test_generator.py:42-132: per-frame mask inference with central
cropping, boundary-score foreground disambiguation (numpy thresholds 0.1
mask / 0.6 boundary), per-category IoU and MAE accumulation, the cyclic
wrap-around of the final batch, and optional overlay PNG / .mat artifact
dumps. The forward (PWC flow + generator + recover) is one jitted function
sharded over the mesh's data axis; host code only does bookkeeping.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import TestPipeline, get_reader
from ..data.device_input import DeviceFeeder
from ..ops.metrics import eval_iou_mae
from ..ops.resize import central_crop_resize, resize_nearest
from ..parallel.mesh import data_sharding, make_mesh, replicate
from ..train.objective import AdversarialObjective

DES_WIDTH = 640
DES_HEIGHT = 384
BOUNDARY_THRESHOLD = 0.6  # test_generator.py:16
MASK_THRESHOLD = 0.1      # test_generator.py:19


def compute_boundary_score_np(mask: np.ndarray) -> float:
    """Reference numpy boundary score (general_utils.py:117-132)."""
    h, w = mask.shape[0], mask.shape[1]
    strips = [mask[0:2], mask[h - 2 : h], mask[:, 0:2], mask[:, w - 2 : w]]
    occ = sum(float(np.sum(s)) for s in strips)
    total = sum(s.size for s in strips)
    return occ / total


def compute_iou_np(gt_mask: np.ndarray, pred_mask_f: np.ndarray,
                   threshold: float = MASK_THRESHOLD):
    """Reference compute_IoU (test_generator.py:19-35): binarize, pick the
    side of the mask occupying < 60% of the border as foreground, IoU."""
    gt = gt_mask.astype(bool)
    pred = pred_mask_f > threshold
    if compute_boundary_score_np(pred) < BOUNDARY_THRESHOLD:
        annotation = pred
    else:
        annotation = np.logical_not(pred)
    if np.isclose(np.sum(annotation), 0) and np.isclose(np.sum(gt), 0):
        return 1.0, annotation
    return (
        np.sum(annotation & gt) / np.sum(annotation | gt, dtype=np.float32),
        annotation,
    )


def compute_mae_np(gt_mask: np.ndarray, pred_mask: np.ndarray) -> float:
    return float(np.mean(np.abs(gt_mask.astype(np.float32) - pred_mask)))


class Evaluator:
    """Owns the jitted inference step for one config."""

    def __init__(self, config: Config, mesh=None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(
            n_data=config.mesh_data or None, n_model=config.mesh_model,
            batch_size=config.batch_size,
        )
        self.objective = AdversarialObjective(config, mesh=self.mesh)
        self._build()

    def _build(self):
        cfg = self.config
        obj = self.objective

        def infer(gen_params, gen_stats, rec_params, pwc_params, img1, img2, gt):
            # Reference order: reader resize (done), central crop, PWC flow,
            # working resize, mask + recover (build_test_graph,
            # adversarial_learner.py:450-523).
            if cfg.test_crop != 1.0:
                img1 = central_crop_resize(img1, cfg.test_crop)
                img2 = central_crop_resize(img2, cfg.test_crop)
                gt = central_crop_resize(gt, cfg.test_crop)
            flow = obj.compute_flow(pwc_params, img1, img2)
            image, flow = obj.resize_to_working(img1, flow)
            gt = resize_nearest(gt, (cfg.img_height, cfg.img_width))
            mask = obj.generate_mask(gen_params, gen_stats, image, flow)
            flow_masked = flow * (1.0 - mask)
            pred_flow = obj.recover.apply(
                {"params": rec_params}, image, flow_masked, mask
            )
            return {
                "gen_masks": mask,
                "pred_flow": pred_flow,
                "input_image": image,
                "gt_flow": flow,
                "gt_masks": gt,
            }

        def infer_metrics(gen_params, gen_stats, pwc_params, img1, img2, gt):
            # Metrics-only variant: same crop/flow/mask path, but IoU+MAE are
            # reduced on device (ops/metrics.eval_iou_mae — exact
            # test_generator.py:19-40 semantics) so only two scalars per
            # frame leave the chip. The recover forward is skipped: the
            # reference computes it at test time but never uses it in the
            # metrics (adversarial_learner.py:508-522, test_generator.py:80-91).
            if cfg.test_crop != 1.0:
                img1 = central_crop_resize(img1, cfg.test_crop)
                img2 = central_crop_resize(img2, cfg.test_crop)
                gt = central_crop_resize(gt, cfg.test_crop)
            flow = obj.compute_flow(pwc_params, img1, img2)
            image, flow = obj.resize_to_working(img1, flow)
            gt = resize_nearest(gt, (cfg.img_height, cfg.img_width))
            mask = obj.generate_mask(gen_params, gen_stats, image, flow)
            iou_b, mae_b = eval_iou_mae(mask.astype(jnp.float32),
                                        gt.astype(jnp.float32))
            return {"iou": iou_b, "mae": mae_b}

        shard = data_sharding(self.mesh)
        repl = replicate(self.mesh)
        self.infer = jax.jit(
            infer,
            in_shardings=(repl, repl, repl, repl, shard, shard, shard),
            out_shardings=shard,
        )
        self.infer_metrics = jax.jit(
            infer_metrics,
            in_shardings=(repl, repl, repl, shard, shard, shard),
            out_shardings=shard,
        )
        self.feeder = DeviceFeeder(self.mesh, (cfg.reader_height, cfg.reader_width))

    def device_batch(self, batch):
        """Raw/host batch -> reader-resolution device tensors."""
        img1, img2 = self.feeder.images(batch)
        return img1, img2, self.feeder.mask(batch)


def evaluate_dataset(config: Config, state, save_dir: Optional[str] = None,
                     generate_visualization: bool = False, verbose: bool = True,
                     evaluator: Optional[Evaluator] = None):
    """Full dataset evaluation; returns the metrics dict
    (test_generator.py:42-132). Pass `evaluator` to reuse compiled steps
    across repeated evaluations of the same config."""
    reader = get_reader(config.dataset, config.root_dir,
                        max_temporal_len=config.max_temporal_len,
                        min_temporal_len=config.min_temporal_len,
                        num_threads=1)
    if evaluator is None:
        evaluator = Evaluator(config)

    if config.dataset == "FBMS":
        tuples = reader.test_tuples(config.test_partition, config.test_temporal_shift)
        pipeline = TestPipeline(
            None, config.batch_size, config.test_temporal_shift,
            reader_hw=(config.reader_height, config.reader_width),
            raw_hw=None, num_threads=config.num_threads, explicit_tuples=tuples,
        )
    else:
        partition = config.test_partition if config.dataset == "DAVIS2016" else "all"
        ds = reader.dataset(partition)
        raw_hw = (
            (reader.raw_height, reader.raw_width)
            if reader.raw_height is not None else None
        )
        pipeline = TestPipeline(
            ds, config.batch_size, config.test_temporal_shift,
            reader_hw=(config.reader_height, config.reader_width),
            raw_hw=raw_hw, num_threads=config.num_threads,
        )

    category_iou: Dict[str, list] = {}
    category_mae: Dict[str, list] = {}
    i = 0
    fetch_dense = bool(generate_visualization and save_dir)
    for batch in pipeline:
        img1, img2, gt = evaluator.device_batch(batch)
        if not fetch_dense:
            # Metrics-only fast path: IoU/MAE reduce on device; only two
            # scalars per frame cross the host<->device link.
            out = evaluator.infer_metrics(
                state.gen_params, state.gen_stats, state.pwc_params,
                img1, img2, gt,
            )
            ious = np.asarray(out["iou"])
            maes = np.asarray(out["mae"])
            for b in range(ious.shape[0]):
                category = batch["category"][b]
                category_iou.setdefault(category, []).append(float(ious[b]))
                category_mae.setdefault(category, []).append(float(maes[b]))
                i += 1
            continue
        out = evaluator.infer(
            state.gen_params, state.gen_stats, state.rec_params, state.pwc_params,
            img1, img2, gt,
        )
        out = jax.tree.map(np.asarray, out)
        for b in range(out["input_image"].shape[0]):
            mask = out["gen_masks"][b]
            gt_mask = out["gt_masks"][b]
            category = batch["category"][b]
            iou, out_mask = compute_iou_np(gt_mask=gt_mask, pred_mask_f=mask)
            mae = compute_mae_np(gt_mask=gt_mask, pred_mask=out_mask)
            category_iou.setdefault(category, []).append(iou)
            category_mae.setdefault(category, []).append(mae)

            if generate_visualization and save_dir:
                cat_dir = os.path.join(save_dir, category)
                os.makedirs(cat_dir, exist_ok=True)
                frame_id = len(category_iou[category])
                from ..utils.visualization import postprocess_image, postprocess_mask

                bgr = postprocess_image(out["input_image"][b])
                overlay = cv2.addWeighted(bgr, 0.5, postprocess_mask(out_mask), 0.4, 0)
                overlay = cv2.resize(overlay, (DES_WIDTH, DES_HEIGHT))
                cv2.imwrite(os.path.join(cat_dir, "frame_%08d.png" % frame_id), overlay)
                import scipy.io as sio

                sio.savemat(
                    os.path.join(cat_dir, "result_%d.mat" % frame_id),
                    {
                        "flow": out["gt_flow"][b],
                        "img1": (out["input_image"][b] + 0.5),
                        "pred_mask": out_mask.astype(np.float64),
                        "gt_mask": gt_mask,
                    },
                )
            i += 1

    tot_ious = tot_maes = 0.0
    per_cat_iou = []
    for cat, list_iou in category_iou.items():
        if verbose:
            print("Category {}: IoU is {} and MAE is {}".format(
                cat, np.mean(list_iou), np.mean(category_mae[cat])))
        tot_ious += np.sum(list_iou)
        tot_maes += np.sum(category_mae[cat])
        per_cat_iou.append(np.mean(list_iou))
    results = {
        "dataset_iou": tot_ious / float(i),
        "dataset_mae": tot_maes / float(i),
        "sequence_iou": float(np.mean(per_cat_iou)),
        "category_iou": {k: float(np.mean(v)) for k, v in category_iou.items()},
        "frames": i,
    }
    if verbose:
        print("The Average over the dataset: IoU is {} and MAE is {}".format(
            results["dataset_iou"], results["dataset_mae"]))
        print("The Average over sequences IoU is {}".format(results["sequence_iou"]))
        print("Success: Processed {} frames".format(i))
    return results
