#!/bin/bash
# Cross-dataset open-set evaluation for the softmax baseline
# (tIoU 0.5:0.05:0.95). Reference: experiments/softmax/eval_softmax_cross_data.sh
set -e
cd "$(dirname "$0")/../.."
EXP_TAG="softmax_crossdata"
python -m opental_tpu.tools.eval_open \
    "output/${EXP_TAG}/split_{id:d}/thumos14_anet_merged.json" \
    datasets/thumos14/annotations/thumos_anet_gt.json \
    --cls_idx_known "datasets/thumos14/annotations_open/split_{id:d}/Class_Index_Known.txt" \
    --open_set --dataset thumos_anet --all_splits 0 1 2 \
    --ood_scoring confidence
