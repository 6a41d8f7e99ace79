#!/bin/bash
# From-scratch bootstrap: build every checkpoint the pipeline needs with no
# external assets, then train and evaluate. The reference hard-requires two
# downloaded checkpoints (a tfoptflow PWC and a FlyingChairs-pretrained
# recover, adversarial_learner.py:339-343 + README); this framework can
# produce both itself:
#
#   1. pretrain_flow.py      — supervised PWC on synthetic warped scenes
#   2. pretrain_recover.py   — recover-net box-inpainting on the dataset,
#                              flow from stage 1's checkpoint
#   3. train.py              — the adversarial stage
#   4. test_generator.py     — raw-mask evaluation
#
#   scripts/bootstrap_from_scratch.sh /path/to/DAVIS_2016 [workdir]
#
# Tunables (env): PWC_STEPS (default 20000), RECOVER_STEPS (5000), and any
# extra flags via EXTRA_FLAGS (applied to every stage — e.g. tiny sizes for
# a smoke run; see tests/test_bootstrap_script.py).
set -e
SCRIPT_DIR=$(dirname "$(realpath "$0")")

DATASET_DIR="${1:?usage: bootstrap_from_scratch.sh /path/to/DAVIS_2016 [workdir]}"
WORKDIR="${2:-/tmp/bootstrap_from_scratch}"
PWC_STEPS="${PWC_STEPS:-20000}"
RECOVER_STEPS="${RECOVER_STEPS:-5000}"

mkdir -p "${WORKDIR}"

echo "[bootstrap 1/4] PWC pretraining (${PWC_STEPS} steps, synthetic warped scenes)"
python3 "${SCRIPT_DIR}/../pretrain_flow.py" \
    --pretrain_steps="${PWC_STEPS}" \
    --checkpoint_dir="${WORKDIR}/pwc" \
    ${EXTRA_FLAGS}

echo "[bootstrap 2/4] recover-net pretraining (${RECOVER_STEPS} steps, box inpainting)"
python3 "${SCRIPT_DIR}/../pretrain_recover.py" \
    --pretrain_steps="${RECOVER_STEPS}" \
    --root_dir="${DATASET_DIR}" \
    --flow_ckpt="${WORKDIR}/pwc/pwc-final" \
    --checkpoint_dir="${WORKDIR}/recover" \
    ${EXTRA_FLAGS}

echo "[bootstrap 3/4] adversarial training"
python3 "${SCRIPT_DIR}/../train.py" \
    --root_dir="${DATASET_DIR}" \
    --flow_ckpt="${WORKDIR}/pwc/pwc-final" \
    --recover_ckpt="${WORKDIR}/recover/recover-final" \
    --checkpoint_dir="${WORKDIR}/model" \
    ${EXTRA_FLAGS}

echo "[bootstrap 4/4] raw-mask evaluation"
python3 "${SCRIPT_DIR}/../test_generator.py" \
    --root_dir="${DATASET_DIR}" \
    --ckpt_file="${WORKDIR}/model/model.best" \
    --flow_ckpt="${WORKDIR}/pwc/pwc-final" \
    --test_save_dir="${WORKDIR}/results" \
    ${EXTRA_FLAGS}

echo "bootstrap complete -> ${WORKDIR}/results"
