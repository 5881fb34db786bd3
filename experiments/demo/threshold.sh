#!/bin/bash
# OOD threshold calibration on the training set (demo split 0).
# Reference: experiments/demo/threshold.sh
set -e
cd "$(dirname "$0")/../.."
EXP_TAG="opental_final"
for SPLIT in 0; do
    PRED=output/${EXP_TAG}/split_${SPLIT}/thumos14_open_trainset.json
    if [ ! -f "$PRED" ]; then
        echo "Threshold the RGB model on Thumos14 Open Set (Split=${SPLIT}):"
        python -m opental_tpu.tools.threshold \
            configs/thumos14_opental_final.yaml \
            --open_set --split=${SPLIT} \
            --ood_scoring uncertainty \
            --output_json=thumos14_open_trainset.json
    else
        echo "Result file exists! ${PRED}"
    fi
done
