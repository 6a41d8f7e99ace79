#!/usr/bin/env python3
"""Multi-crop ensemble evaluation CLI (reference test_generator_ensemble.py).

Evaluates the 4 center crops {0.85, 0.9, 0.95, 1.0} per frame and writes
multi-crop .mat buffers (img_1_XXX / pred_mask_XXX / gt_mask_XXX keys) for
the post-processing pipeline.
"""

import os
import sys

import numpy as np


def _test_masks(config):
    import jax
    import scipy.io as sio

    from unsupervised_detection_tpu.data import TestPipeline, get_reader
    from unsupervised_detection_tpu.eval.ensemble import EnsembleEvaluator
    from unsupervised_detection_tpu.eval.evaluator import compute_iou_np, compute_mae_np
    from unsupervised_detection_tpu.train import AdversarialLearner
    from unsupervised_detection_tpu.train import checkpoint as ckpt
    from unsupervised_detection_tpu.train import tf1_import

    learner = AdversarialLearner(config)
    state = learner.init_state(jax.random.PRNGKey(config.seed))
    checkpoint = config.ckpt_file
    if checkpoint:
        if tf1_import.is_tf_checkpoint(checkpoint):
            state = tf1_import.restore_tf1_full(checkpoint, state)
        else:
            state = ckpt.restore_checkpoint(checkpoint, state)
        print("Resume model from checkpoint {}".format(checkpoint))
    else:
        raise IOError("Checkpoint file not found")

    reader = get_reader(config.dataset, config.root_dir,
                        max_temporal_len=config.max_temporal_len,
                        min_temporal_len=config.min_temporal_len, num_threads=1)
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
        raw_hw = ((reader.raw_height, reader.raw_width)
                  if reader.raw_height is not None else None)
        pipeline = TestPipeline(
            ds, config.batch_size, config.test_temporal_shift,
            reader_hw=(config.reader_height, config.reader_width),
            raw_hw=raw_hw, num_threads=config.num_threads,
        )

    evaluator = EnsembleEvaluator(config)
    test_crops = evaluator.test_crops
    category_iou, category_mae = {}, {}
    i = 0
    for batch in pipeline:
        out = evaluator.run(state, batch)
        bsz = out["pred_masks"].shape[1]
        for b in range(bsz):
            category = batch["category"][b]
            cropped_iou, cropped_mae = [], []
            out_masks = {}
            for ci, crop in enumerate(test_crops):
                mask = out["pred_masks"][ci, b]
                gt_mask = out["gt_masks"][ci, b]
                iou, out_mask = compute_iou_np(gt_mask=gt_mask, pred_mask_f=mask)
                out_masks[crop] = out_mask
                cropped_iou.append(iou)
                cropped_mae.append(compute_mae_np(gt_mask=gt_mask, pred_mask=out_mask))
            # Deliberate fix of a reference bug: the reference's
            # except-KeyError branch seeds a brand-new category with the LAST
            # crop's iou/mae instead of the 4-crop mean
            # (test_generator_ensemble.py:75-80 upstream), so the first frame
            # of every category is mis-averaged there. We use the crop mean
            # for every frame, including the first.
            category_iou.setdefault(category, []).append(float(np.mean(cropped_iou)))
            category_mae.setdefault(category, []).append(float(np.mean(cropped_mae)))

            if config.generate_visualization and config.test_save_dir:
                save_dir = os.path.join(config.test_save_dir, category)
                os.makedirs(save_dir, exist_ok=True)
                n = len(category_iou[category])
                matlab_out = {}
                for ci, crop in enumerate(test_crops):
                    key = "{:03d}".format(int(crop * 100))
                    matlab_out["img_1_" + key] = out["img_1s"][ci, b]
                    matlab_out["pred_mask_" + key] = out_masks[crop].astype(np.float64)
                    matlab_out["gt_mask_" + key] = out["gt_masks"][ci, b]
                sio.savemat(os.path.join(save_dir, "result_{}.mat".format(n)), matlab_out)
            i += 1

    tot_ious = tot_maes = 0.0
    for cat, list_iou in category_iou.items():
        print("Category {}: IoU is {} and MAE is {}".format(
            cat, np.mean(list_iou), np.mean(category_mae[cat])))
        tot_ious += np.sum(list_iou)
        tot_maes += np.sum(category_mae[cat])
    print("The Average over the dataset: IoU is {} and MAE is {}".format(
        tot_ious / float(i), tot_maes / float(i)))
    print("Success: Processed {} frames".format(i))


def main(argv):
    from unsupervised_detection_tpu.config import parse_flags
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    config = parse_flags(argv[1:])
    _test_masks(config)


if __name__ == "__main__":
    main(sys.argv)
