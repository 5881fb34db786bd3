#!/bin/bash
# Gradient-norm / MIB-weight curves from the training metrics log.
# Reference: experiments/draw_gradnorm.sh -> experiments/analyze_gradnorm.py
set -e
cd "$(dirname "$0")/.."
SPLIT=0
python -m opental_tpu.tools.analysis gradnorm \
    models/thumos14/opental_final/split_${SPLIT}/metrics.jsonl \
    --out models/thumos14/opental_final/split_${SPLIT}/gradnorm.png
