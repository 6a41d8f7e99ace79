#!/bin/bash
#
# Run flow+mask inference on an arbitrary unannotated video (reference
# scripts/test_video.sh): extract frames into a DAVIS-layout tree with
# create_data_frvideo.py, then evaluate with test_generator.py.
###

set -e
SCRIPT_DIR=$(dirname "$(realpath "$0")")

VIDEO_FILE="${1:-${SCRIPT_DIR}/../download/video/todaiura_traffic.MOV}"

DOWNLOAD_DIR="${SCRIPT_DIR}/../download"
CKPT_FILE="${DOWNLOAD_DIR}/unsupervised_detection_models/davis_best_model/model.best"
PWC_CKPT_FILE="${DOWNLOAD_DIR}/pwcnet-lg-6-2-multisteps-chairsthingsmix/pwcnet.ckpt-595000.data-00000-of-00001"
DATASET_DIR="${DOWNLOAD_DIR}/video"
RESULT_DIR="${SCRIPT_DIR}/../results/video"

echo "[INFO] start creating data from your video..."
python3 ${SCRIPT_DIR}/create_data_frvideo.py ${VIDEO_FILE}
echo "[INFO] finished creating data from your video."

echo "[INFO] start running a test..."
mkdir -p ${RESULT_DIR}
python3 test_generator.py \
--dataset=DAVIS2016 \
--ckpt_file=$CKPT_FILE \
--flow_ckpt=$PWC_CKPT_FILE \
--test_crop=0.9 \
--test_temporal_shift=1 \
--root_dir=$DATASET_DIR \
--generate_visualization=True \
--test_save_dir=${RESULT_DIR}
echo "[INFO] finished the test."
