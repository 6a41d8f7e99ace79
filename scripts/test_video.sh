#!/bin/bash
# Flow+mask inference on an arbitrary unannotated video: frames are
# extracted into a DAVIS-layout tree (create_data_frvideo.py, ffmpeg with a
# cv2 fallback), then evaluated with the published checkpoints.
#
#   scripts/test_video.sh [/path/to/video]
set -e
SCRIPT_DIR=$(dirname "$(realpath "$0")")
source "${SCRIPT_DIR}/fetch_assets.sh"

VIDEO_FILE="${1:-${DOWNLOAD_DIR}/video/todaiura_traffic.MOV}"
DATASET_DIR="${DOWNLOAD_DIR}/video"
RESULT_DIR="${SCRIPT_DIR}/../results/video"

fetch_models

echo "extracting frames from ${VIDEO_FILE}"
python3 "${SCRIPT_DIR}/create_data_frvideo.py" "${VIDEO_FILE}"

mkdir -p "${RESULT_DIR}"
python3 "${SCRIPT_DIR}/../test_generator.py" \
    --dataset=DAVIS2016 \
    --ckpt_file="${CKPT_FILE}" \
    --flow_ckpt="${PWC_CKPT_FILE}" \
    --test_crop=0.9 \
    --test_temporal_shift=1 \
    --root_dir="${DATASET_DIR}" \
    --generate_visualization=True \
    --test_save_dir="${RESULT_DIR}"
echo "video inference done -> ${RESULT_DIR}"
