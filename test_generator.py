#!/usr/bin/env python3
"""Raw evaluation CLI (reference test_generator.py, same flag surface).

Computes per-category and dataset IoU/MAE with boundary-score fg/bg
disambiguation; optional overlay PNG + .mat dumps via
--generate_visualization.
"""

import sys


def _test_masks(config):
    import jax

    from unsupervised_detection_tpu.eval import evaluate_dataset
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

    evaluate_dataset(
        config, state,
        save_dir=config.test_save_dir or None,
        generate_visualization=config.generate_visualization,
    )


def main(argv):
    from unsupervised_detection_tpu.config import parse_flags
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    config = parse_flags(argv[1:])
    _test_masks(config)


if __name__ == "__main__":
    main(sys.argv)
