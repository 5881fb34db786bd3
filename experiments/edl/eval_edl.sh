#!/bin/bash
set -e
cd "$(dirname "$0")/../.."
python -m opental_tpu.tools.eval_open \
    "output/open_edl/split_{id:d}/thumos14_open_rgb.json" \
    datasets/thumos14/annotations/thumos_gt.json \
    --cls_idx_known "datasets/thumos14/annotations_open/split_{id:d}/Class_Index_Known.txt" \
    --open_set --all_splits 0 1 2 --ood_scoring uncertainty
