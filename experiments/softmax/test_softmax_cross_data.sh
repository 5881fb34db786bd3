#!/bin/bash
# Cross-dataset inference (ANet videos as the unknown pool) for the softmax
# baseline. Reference: experiments/softmax/test_softmax_cross_data.sh
set -e
cd "$(dirname "$0")/../.."
EXP_TAG="softmax_crossdata"
for SPLIT in 0 1 2; do
    PRED=output/${EXP_TAG}/split_${SPLIT}/thumos14_anet_merged.json
    if [ ! -f "$PRED" ]; then
        echo "Cross-data test (softmax, Split=${SPLIT}):"
        python -m opental_tpu.tools.test_cross_data \
            configs/thumos14_softmax.yaml \
            --open_set --split=${SPLIT} --exp_tag=${EXP_TAG} \
            --output_json=thumos14_anet_merged.json
    else
        echo "Result file exists! ${PRED}"
    fi
done
