#!/usr/bin/env python3
"""Recover-net pretraining CLI: flow inpainting of random box occlusions.

The reference repo only distributes the resulting checkpoint
(README.md:83-87); this CLI reproduces the pretraining stage. Uses the same
flag surface as train.py; `--checkpoint_dir` receives recover-scope
checkpoints consumable via train.py --recover_ckpt.

Extra positional-style flag: --pretrain_steps (default 5000).
"""

import os
import sys


def main(argv):
    from unsupervised_detection_tpu.config import parse_flags
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    steps = 5000
    filtered = []
    for arg in argv[1:]:
        if arg.startswith("--pretrain_steps="):
            steps = int(arg.split("=", 1)[1])
        else:
            filtered.append(arg)
    config = parse_flags(filtered)

    if config.checkpoint_dir and not os.path.exists(config.checkpoint_dir):
        os.makedirs(config.checkpoint_dir)

    from unsupervised_detection_tpu.train.pretrain import pretrain_recover

    pretrain_recover(config, steps=steps)


if __name__ == "__main__":
    main(sys.argv)
