#!/bin/bash
# Score/uncertainty/actionness distribution figures for the EDL model.
# Reference: experiments/demo/draw_uncertainty_dist.sh ->
# AFSD/thumos14/draw_distribution.py
set -e
cd "$(dirname "$0")/../.."
EXP_TAG="open_edl"
SPLIT=0
python -m opental_tpu.tools.analysis distribution \
    configs/thumos14_open_edl.yaml --open_set --split ${SPLIT} \
    --gt_json datasets/thumos14/annotations/thumos_gt.json \
    --cls_idx datasets/thumos14/annotations_open/split_${SPLIT}/Class_Index_Known.txt \
    --ood_scoring uncertainty_actionness \
    --pred_json output/${EXP_TAG}/split_${SPLIT}/thumos14_open_rgb.json \
    --out_dir output/${EXP_TAG}/split_${SPLIT}/dist_norm
