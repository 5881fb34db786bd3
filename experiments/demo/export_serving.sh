#!/bin/bash
# One-file AOT serving export: serialize the window-batched
# forward+decode (weights baked in) for deployment on TPU hosts.
# Beyond-reference capability (tools/export.py, jax.export StableHLO).
set -e
cd "$(dirname "$0")/../.."
SPLIT=0
python -m opental_tpu.tools.export \
    configs/thumos14_opental_final.yaml \
    --checkpoint_path models/thumos14/opental_final/split_${SPLIT}/checkpoint-latest \
    --out output/opental_final/split_${SPLIT}/model.jaxexp \
    --window_batch 128 --platforms tpu,cpu
