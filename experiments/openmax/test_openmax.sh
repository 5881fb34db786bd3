#!/bin/bash
# OpenMax baseline: MAV extraction + Weibull fit + recalibrated test.
set -e
cd "$(dirname "$0")/../.."
for SPLIT in 0 1 2; do
    python -m opental_tpu.tools.test_openmax configs/thumos14_openmax.yaml \
        --open_set --split=${SPLIT} --output_json=thumos14_open_rgb.json
done
