#!/bin/bash
# Reference: datasets/get_anet_npy.sh — shard-decode the 112px ANet
# train_val mp4s into npy files with 8 workers.
cd "$(dirname "$0")/.."

python -m opental_tpu.tools.preprocess video2npy \
    --video_dir datasets/activitynet/train_val_112 \
    --output_dir datasets/activitynet/train_val_npy_112 \
    --max_frames 768 --workers 8

echo "Done!"
