#!/bin/bash
# Per-class per-stage score/uncertainty distribution grid + summary CSV
# (round-3 analysis depth; extends draw_distribution.py's figure set).
set -e
cd "$(dirname "$0")/../.."
SPLIT=0
python -m opental_tpu.tools.analysis per_class \
    configs/thumos14_opental_final.yaml --open_set --split ${SPLIT} \
    --gt_json datasets/thumos14/annotations/thumos_gt.json \
    --cls_idx datasets/thumos14/annotations_open/split_${SPLIT}/Class_Index_Known.txt \
    --ood_scoring uncertainty \
    --out_dir output/opental_final/split_${SPLIT}/per_class
