#!/bin/bash
# Adversarial training on DAVIS2016 with the canonical hyperparameters
# (flow_normalizer 80, epsilon 75, 1:3 recover:generator alternation,
# 0.6 train crop — the reference's published recipe). Set the three paths,
# optionally pre-train the recover net first with pretrain_recover.py.
set -e
SCRIPT_DIR=$(dirname "$(realpath "$0")")

DATASET_DIR='/path/to/DAVIS_2016/'
PWC_CKPT='/path/to/PWCNet/pwcnet-lg-6-2-multisteps-chairsthingsmix/pwcnet.ckpt-595000'
RECOVER_CKPT='/path/to/pretrained_recover/model-175'
CHECKPOINT_DIR="${CHECKPOINT_DIR:-/tmp/tests}"

python3 "${SCRIPT_DIR}/../train.py" \
    --flow_normalizer=80.0 \
    --epsilon=75.0 \
    --max_temporal_len=2 \
    --train_crop=0.6 \
    --test_crop=0.9 \
    --iters_rec=1 \
    --iters_gen=3 \
    --dataset=DAVIS2016 \
    --root_dir="${DATASET_DIR}" \
    --flow_ckpt="${PWC_CKPT}" \
    --recover_ckpt="${RECOVER_CKPT}" \
    --test_temporal_shift=1 \
    --checkpoint_dir="${CHECKPOINT_DIR}"
