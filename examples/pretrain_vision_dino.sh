#!/bin/bash
# DINO self-supervised ViT pretraining (examples/pretrain_vision_dino.sh)
set -euo pipefail

DATA=${DATA:-/data/imagenet/train}

python pretrain_vision_dino.py \
    --num-layers 12 --hidden-size 768 --patch-size 16 --img-size 224 \
    --out-dim 4096 --batch-size 256 --train-steps 90000 \
    --lr 5e-4 --precision bf16 \
    --data-dir "$DATA" \
    --save ./checkpoints/dino --save-interval 1000 --resume \
    --log-interval 10 "$@"
