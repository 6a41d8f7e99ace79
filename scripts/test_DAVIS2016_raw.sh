#!/bin/bash
# Raw (pre-post-processing) DAVIS2016 val evaluation with the published
# checkpoints. The TF1 checkpoint bundles load directly — test_generator.py
# converts them through train/tf1_import.py; PWC flow + generator mask run
# jitted on the TPU.
#
# ACCEPTANCE GATE (first run on a data-bearing machine): the dataset
# average IoU printed at the end is the DAVIS2016 val J-mean; with the
# published checkpoints expect >= 0.592 raw (reference README table;
# post-processing lifts it to ~0.715 — see generate_buffer_DAVIS2016.sh
# + post_processing.py for that chain). BASELINE.md records both numbers.
#
# Env overrides: DOWNLOAD_DIR (asset root), RESULT_DIR (output),
# EXTRA_FLAGS (appended to test_generator.py — e.g. tiny sizes for the
# no-network readiness drill, tests/test_readiness_drill.py).
set -e
SCRIPT_DIR=$(dirname "$(realpath "$0")")
source "${SCRIPT_DIR}/fetch_assets.sh"

RESULT_DIR="${RESULT_DIR:-${SCRIPT_DIR}/../results/DAVIS}"

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
    --test_save_dir="${RESULT_DIR}" \
    ${EXTRA_FLAGS}
echo "raw DAVIS2016 evaluation done -> ${RESULT_DIR}"
echo "gate: dataset-average IoU >= 0.592 expected with the published checkpoints"
