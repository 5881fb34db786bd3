#!/bin/bash
# Cross-dataset test: THUMOS model over ANet unknowns, merged JSON.
set -e
cd "$(dirname "$0")/../.."
for SPLIT in 0 1 2; do
    python -m opental_tpu.tools.test_cross_data \
        configs/thumos14_opental_final.yaml \
        --open_set --split=${SPLIT} \
        --output_json=thumos14_anet_merged.json
done
