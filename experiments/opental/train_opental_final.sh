#!/bin/bash
# Train OpenTAL-final (MIB-EDL + actionness + IoU calibration) on one
# THUMOS14 open split. Usage: train_opental_final.sh <SPLIT>
set -e
cd "$(dirname "$0")/../.."
SPLIT=${1:-0}
python -m opental_tpu.tools.train \
    configs/thumos14_opental_final.yaml \
    --lw=1 --cw=10 --ctw=1 --ssl=0.001 --piou=0.5 \
    --open_set --split=${SPLIT}
