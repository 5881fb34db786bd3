#!/bin/bash
# Actionness study: per-bucket prior-level actionness/uncertainty
# distributions at both pyramid stages.
# Reference: experiments/demo/analyze_actionness.sh ->
# experiments/analyze_actionness.py
set -e
cd "$(dirname "$0")/../.."
EXP_TAG="opental_final"
SPLIT=0
python -m opental_tpu.tools.analysis actionness \
    configs/thumos14_opental_final.yaml --open_set --split ${SPLIT} \
    --gt_json datasets/thumos14/annotations/thumos_gt.json \
    --cls_idx datasets/thumos14/annotations_open/split_${SPLIT}/Class_Index_Known.txt \
    --out_dir output/${EXP_TAG}/split_${SPLIT}/dist_norm
