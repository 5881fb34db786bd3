#!/bin/bash
# Window-batched inference on the THUMOS14 open splits (idempotent).
set -e
cd "$(dirname "$0")/../.."
EXP_TAG="opental_final"
for SPLIT in 0 1 2; do
    PRED=output/${EXP_TAG}/split_${SPLIT}/thumos14_open_rgb.json
    if [ ! -f "$PRED" ]; then
        python -m opental_tpu.tools.test \
            configs/thumos14_opental_final.yaml \
            --open_set --split=${SPLIT} \
            --output_json=thumos14_open_rgb.json
    else
        echo "Result file exists! ${PRED}"
    fi
done
