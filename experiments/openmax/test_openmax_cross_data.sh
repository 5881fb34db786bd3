#!/bin/bash
# Cross-dataset OpenMax inference (MAV + weibull recalibration over the
# THUMOS+ANet pool). Reference: experiments/openmax/test_openmax_cross_data.sh
set -e
cd "$(dirname "$0")/../.."
EXP_TAG="openmax_crossdata"
for SPLIT in 0 1 2; do
    PRED=output/${EXP_TAG}/split_${SPLIT}/thumos14_anet_merged.json
    if [ ! -f "$PRED" ]; then
        python -m opental_tpu.tools.test_openmax \
            configs/thumos14_openmax.yaml \
            --open_set --split=${SPLIT} --exp_tag=${EXP_TAG} \
            --cross_data \
            --output_json=thumos14_anet_merged.json
    else
        echo "Result file exists! ${PRED}"
    fi
done
