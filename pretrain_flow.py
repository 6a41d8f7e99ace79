#!/usr/bin/env python3
"""PWC flow-network pretraining CLI: supervised training on synthetic
warped scenes.

The reference pipeline requires a pretrained PWC checkpoint and hard-aborts
without one (adversarial_learner.py:339-343) but ships no code to produce
one; this CLI bootstraps a flow network from scratch with no external data
(train/pretrain_pwc.py). Uses the same flag surface as train.py;
`--checkpoint_dir` receives pwc-scope checkpoints consumable via
train.py --flow_ckpt.

Extra flags: --pretrain_steps (default 20000), --lr_schedule
(constant|cosine, default constant).
"""

import os
import sys


def main(argv):
    from unsupervised_detection_tpu.config import parse_flags
    from unsupervised_detection_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    steps = 20000
    lr_schedule = "constant"
    filtered = []
    for arg in argv[1:]:
        if arg.startswith("--pretrain_steps="):
            steps = int(arg.split("=", 1)[1])
        elif arg.startswith("--lr_schedule="):
            lr_schedule = arg.split("=", 1)[1]
        else:
            filtered.append(arg)
    config = parse_flags(filtered)

    if config.checkpoint_dir and not os.path.exists(config.checkpoint_dir):
        os.makedirs(config.checkpoint_dir)

    from unsupervised_detection_tpu.train.pretrain_pwc import pretrain_pwc

    pretrain_pwc(config, steps=steps, lr_schedule=lr_schedule)


if __name__ == "__main__":
    main(sys.argv)
