#!/usr/bin/env python3
"""Adversarial training CLI (reference train.py, same flag surface)."""

import os
import pprint
import random
import sys

import numpy as np


def _main(config):
    # Seed everything (reference train.py:16-21, seed 8964).
    np.random.seed(config.seed)
    random.seed(config.seed)

    pp = pprint.PrettyPrinter()
    pp.pprint(config.__dict__)

    if config.checkpoint_dir and not os.path.exists(config.checkpoint_dir):
        os.makedirs(config.checkpoint_dir)

    from unsupervised_detection_tpu.train.driver import train

    train(config)


def main(argv):
    from unsupervised_detection_tpu.config import parse_flags
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    config = parse_flags(argv[1:])
    _main(config)


if __name__ == "__main__":
    main(sys.argv)
