#!/bin/bash
# Shared asset fetcher, sourced by the launcher scripts.
#
# Resolves the published artifacts this framework consumes (asset URLs are
# part of the reference's contract; the TF1 checkpoint bundles are converted
# on the fly by unsupervised_detection_tpu/train/tf1_import.py):
#   * trained generator/recover checkpoints (rpg.ifi.uzh.ch)
#   * the PWC-Net chairs+things checkpoint (Google Drive, via gdown)
#   * the DAVIS2016 dataset (graphics.ethz.ch)
#
# Usage: source fetch_assets.sh; then call `fetch_models`, `fetch_davis`,
# or both. Everything lands under $DOWNLOAD_DIR (default: <repo>/download).

ASSETS_SCRIPT_DIR=$(dirname "$(realpath "${BASH_SOURCE[0]}")")
DOWNLOAD_DIR="${DOWNLOAD_DIR:-${ASSETS_SCRIPT_DIR}/../download}"

CKPT_FILE="${DOWNLOAD_DIR}/unsupervised_detection_models/davis_best_model/model.best"
PWC_CKPT_FILE="${DOWNLOAD_DIR}/pwcnet-lg-6-2-multisteps-chairsthingsmix/pwcnet.ckpt-595000.data-00000-of-00001"
DAVIS_DIR="${DOWNLOAD_DIR}/DAVIS"

fetch_models() {
    mkdir -p "${DOWNLOAD_DIR}"
    if ! ls "${CKPT_FILE}".data* >/dev/null 2>&1; then
        echo "fetch_assets: trained checkpoints missing -> downloading"
        (cd "${DOWNLOAD_DIR}" &&
            wget https://rpg.ifi.uzh.ch/data/unsupervised_detection_models.zip &&
            unzip unsupervised_detection_models.zip &&
            rm unsupervised_detection_models.zip)
    fi
    if [ ! -f "${PWC_CKPT_FILE}" ]; then
        echo "fetch_assets: PWC-Net checkpoint missing -> downloading"
        (cd "${DOWNLOAD_DIR}" &&
            gdown --folder "https://drive.google.com/drive/folders/1gtGx_6MjUQC5lZpl6-Ia718Y_0pvcYou")
    fi
}

fetch_davis() {
    mkdir -p "${DOWNLOAD_DIR}"
    if [ ! -e "${DAVIS_DIR}" ]; then
        echo "fetch_assets: DAVIS2016 missing -> downloading"
        (cd "${DOWNLOAD_DIR}" &&
            wget https://graphics.ethz.ch/Downloads/Data/Davis/DAVIS-data.zip &&
            unzip DAVIS-data.zip &&
            rm DAVIS-data.zip)
    fi
}
