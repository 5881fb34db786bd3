#!/bin/bash
set -e
cd "$(dirname "$0")/../.."
for SPLIT in 0; do
    python -m opental_tpu.tools.test_anet configs/anet_opental.yaml \
        --open_set --split=${SPLIT} --output_json=anet_open_rgb.json
done
