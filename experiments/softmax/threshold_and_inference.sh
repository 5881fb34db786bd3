#!/bin/bash
# Test-set inference + training-set threshold calibration for the softmax
# baseline (demo prep). Reference: experiments/softmax/threshold_and_inference.sh
set -e
cd "$(dirname "$0")/../.."
EXP_TAG="open_softmax"
for SPLIT in 0 1 2; do
    PRED=output/${EXP_TAG}/split_${SPLIT}/thumos14_open_rgb.json
    if [ ! -f "$PRED" ]; then
        python -m opental_tpu.tools.test configs/thumos14_softmax.yaml \
            --open_set --split=${SPLIT} \
            --output_json=thumos14_open_rgb.json
    else
        echo "Result file exists! ${PRED}"
    fi
done
for SPLIT in 0 1 2; do
    PRED=output/${EXP_TAG}/split_${SPLIT}/thumos14_open_trainset.json
    if [ ! -f "$PRED" ]; then
        python -m opental_tpu.tools.threshold configs/thumos14_softmax.yaml \
            --open_set --split=${SPLIT} \
            --ood_scoring confidence \
            --output_json=thumos14_open_trainset.json
    else
        echo "Result file exists! ${PRED}"
    fi
done
