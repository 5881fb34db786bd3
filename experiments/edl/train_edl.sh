#!/bin/bash
set -e
cd "$(dirname "$0")/../.."
SPLIT=${1:-0}
python -m opental_tpu.tools.train configs/thumos14_open_edl.yaml \
    --open_set --split=${SPLIT}
