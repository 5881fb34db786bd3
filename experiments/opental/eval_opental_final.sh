#!/bin/bash
# Closed + open evaluation across splits (mean +- 1.96 SEM).
set -e
cd "$(dirname "$0")/../.."
EXP_TAG="opental_final"
OOD_SCORING="uncertainty"
MODEL_OUTPUT="output/${EXP_TAG}/split_{id:d}/thumos14_open_rgb.json"
CLS_IDX="datasets/thumos14/annotations_open/split_{id:d}/Class_Index_Known.txt"

echo "Closed Set Evaluation (15 classes)"
python -m opental_tpu.tools.eval_open "${MODEL_OUTPUT}" \
    "datasets/thumos14/annotations_open/split_{id:d}/known_gt.json" \
    --cls_idx_known "${CLS_IDX}" --all_splits 0 1 2 \
    --ood_scoring ${OOD_SCORING}

echo "Open Set Evaluation (15+1 classes)"
python -m opental_tpu.tools.eval_open "${MODEL_OUTPUT}" \
    datasets/thumos14/annotations/thumos_gt.json \
    --cls_idx_known "${CLS_IDX}" --open_set --all_splits 0 1 2 \
    --ood_scoring ${OOD_SCORING}
