#!/bin/bash
# Data/FSDP/TP-parallel CLIP (single mesh) — the open_CLIP DDP-equivalent
# config with global-batch InfoNCE all-gather over ICI.
set -euo pipefail

python pretrain_clip.py \
    --model ViT-B-16 \
    --train-data "${DATA:-/data/laion/{00000..09999}.tar}" \
    --train-num-samples "${NUM_SAMPLES:-10000000}" \
    --batch-size 8192 \
    --epochs 10 \
    --lr 1e-3 --warmup 2000 \
    --precision bf16 \
    --fsdp-parallel-size 2 \
    --grad-clip-norm 1.0 \
    --save ./checkpoints --name clip-dp --resume latest \
    --zeroshot-frequency 1 \
    --log-interval 20 "$@"
