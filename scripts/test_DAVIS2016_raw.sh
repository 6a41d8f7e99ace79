#!/bin/bash
# Raw (pre-post-processing) DAVIS2016 val evaluation with the published
# checkpoints. Expected score: J-mean ~0.592 raw (BASELINE.md). The TF1
# checkpoint bundles load directly — test_generator.py converts them through
# train/tf1_import.py; PWC flow + generator mask run jitted on the TPU.
set -e
SCRIPT_DIR=$(dirname "$(realpath "$0")")
source "${SCRIPT_DIR}/fetch_assets.sh"

RESULT_DIR="${SCRIPT_DIR}/../results/DAVIS"

fetch_models
fetch_davis

mkdir -p "${RESULT_DIR}"
python3 "${SCRIPT_DIR}/../test_generator.py" \
    --dataset=DAVIS2016 \
    --ckpt_file="${CKPT_FILE}" \
    --flow_ckpt="${PWC_CKPT_FILE}" \
    --test_crop=0.9 \
    --test_temporal_shift=1 \
    --root_dir="${DAVIS_DIR}" \
    --generate_visualization=True \
    --test_save_dir="${RESULT_DIR}"
echo "raw DAVIS2016 evaluation done -> ${RESULT_DIR}"
