#!/bin/bash
# Closed-set AFSD protocol: test + eval the pretrained RGB, flow, and
# RGB+flow fusion models. Reference: experiments/eval_pretrained.sh
set -e
cd "$(dirname "$0")/.."
DATASET=thumos14

echo "Test the ${DATASET} RGB model:"
python -m opental_tpu.tools.test configs/${DATASET}.yaml \
    --checkpoint_path=models/${DATASET}/checkpoint-15.ckpt \
    --output_json=${DATASET}_rgb.json
python -m opental_tpu.tools.eval_open output/${DATASET}_rgb.json \
    datasets/thumos14/annotations/thumos_gt.json --all_splits 0

echo "Test the ${DATASET} Flow model:"
python -m opental_tpu.tools.test configs/${DATASET}_flow.yaml \
    --checkpoint_path=models/${DATASET}_flow/checkpoint-16.ckpt \
    --output_json=${DATASET}_flow.json
python -m opental_tpu.tools.eval_open output/${DATASET}_flow.json \
    datasets/thumos14/annotations/thumos_gt.json --all_splits 0

echo "Test the ${DATASET} RGB+Flow model:"
python -m opental_tpu.tools.test configs/${DATASET}.yaml \
    --fusion --output_json=${DATASET}_fusion.json
python -m opental_tpu.tools.eval_open output/${DATASET}_fusion.json \
    datasets/thumos14/annotations/thumos_gt.json --all_splits 0
