#!/bin/bash
# Closed + open evaluation of the OpenMax baseline.
# Reference: experiments/openmax/eval_openmax.sh
set -e
cd "$(dirname "$0")/../.."
EXP_TAG="openmax"
OUT="output/${EXP_TAG}/split_{id:d}/thumos14_open_rgb.json"
CLS="datasets/thumos14/annotations_open/split_{id:d}/Class_Index_Known.txt"

echo "Closed Set Evaluation (15 Classes)"
python -m opental_tpu.tools.eval_open "$OUT" \
    "datasets/thumos14/annotations_open/split_{id:d}/known_gt.json" \
    --cls_idx_known "$CLS" --all_splits 0 1 2

echo "Open Set Evaluation (15+1 Classes)"
python -m opental_tpu.tools.eval_open "$OUT" \
    datasets/thumos14/annotations/thumos_gt.json \
    --cls_idx_known "$CLS" --open_set --draw_auc --all_splits 0 1 2 \
    --ood_scoring confidence
