#!/bin/bash
# ViT classification pretraining on an ImageFolder (zPretrain/pretrain_vit.sh)
set -euo pipefail

DATA=${DATA:-/data/imagenet/train}

python pretrain_vision_classify.py \
    --num-layers 12 --hidden-size 768 --patch-size 16 --img-size 224 \
    --num-classes 1000 --batch-size 256 --train-steps 90000 \
    --lr 3e-4 --precision bf16 \
    --data-dir "$DATA" \
    --save ./checkpoints/vit --save-interval 1000 --resume \
    --log-interval 10 "$@"
