#!/usr/bin/env bash
# FineGym acquisition driver (reference: datasets/download_finegym.sh):
# fetch the public annotation files, then crawl the videos through the
# downloader CLI. Requires network + yt-dlp (pass DOWNLOADER=youtube-dl
# to use the reference's tool).
set -e

DATA_DIR=${DATA_DIR:-./finegym}
ANNO_DIR="${DATA_DIR}/annotations"
DOWNLOADER=${DOWNLOADER:-yt-dlp}

if [[ ! -d "${ANNO_DIR}" ]]; then
  echo "${ANNO_DIR} does not exist. Creating"
  mkdir -p "${ANNO_DIR}"
  echo "Downloading annotations..."
  wget https://sdolivia.github.io/FineGym/resources/dataset/finegym_annotation_info_v1.0.json -O "${ANNO_DIR}/annotation.json"
  wget https://sdolivia.github.io/FineGym/resources/dataset/gym99_train_element_v1.0.txt -O "${ANNO_DIR}/gym99_train_org.txt"
  wget https://sdolivia.github.io/FineGym/resources/dataset/gym99_val_element.txt -O "${ANNO_DIR}/gym99_val_org.txt"
fi

echo "Downloading videos..."
python -m opental_tpu.tools.download "${ANNO_DIR}/annotation.json" \
  "${DATA_DIR}/videos" --downloader "${DOWNLOADER}" \
  --report "${DATA_DIR}/download_report.json"
