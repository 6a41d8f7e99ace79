#!/bin/bash
# Build the multi-shift prediction buffer that post_processing.py consumes:
# one 4-crop ensemble evaluation per temporal shift in {-2,-1,1,2}, each
# writing per-frame .mat files (the ensemble runs as a single 4B batch on
# the TPU — eval/ensemble.py). Paths below must point at your assets; the
# buffer lands in /tmp/buffer_davis/davis_shift_<s> as post_processing.py
# expects.
set -e
SCRIPT_DIR=$(dirname "$(realpath "$0")")

CKPT_FILE='/path/to/checkpoint'
DATASET_DIR='/path/to/DAVIS2016'
PWC_CKPT_FILE='/path/to/pwc_ckpt/'
MAX_SHIFT=2

for shift in $(seq -${MAX_SHIFT} ${MAX_SHIFT}); do
    [ "${shift}" -eq 0 ] && continue
    python3 "${SCRIPT_DIR}/../test_generator_ensemble.py" \
        --dataset=DAVIS2016 \
        --ckpt_file="${CKPT_FILE}" \
        --root_dir="${DATASET_DIR}" \
        --flow_ckpt="${PWC_CKPT_FILE}" \
        --test_temporal_shift="${shift}" \
        --test_partition='val' \
        --generate_visualization=True \
        --test_save_dir="/tmp/buffer_davis/davis_shift_${shift}"
done
echo "prediction buffer complete -> /tmp/buffer_davis"
