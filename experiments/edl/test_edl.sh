#!/bin/bash
set -e
cd "$(dirname "$0")/../.."
for SPLIT in 0 1 2; do
    python -m opental_tpu.tools.test configs/thumos14_open_edl.yaml \
        --open_set --split=${SPLIT} --output_json=thumos14_open_rgb.json
done
