#!/bin/bash
# Masked-patch inpainting pretraining (examples/pretrain_vision_inpaint.sh)
set -euo pipefail

DATA=${DATA:-/data/imagenet/train}

python pretrain_vision_inpaint.py \
    --num-layers 12 --hidden-size 768 --patch-size 16 --image-size 224 \
    --mask-ratio 0.5 --batch-size 256 --train-steps 90000 \
    --lr 3e-4 --precision bf16 \
    --data-dir "$DATA" \
    --save ./checkpoints/inpaint --save-interval 1000 --resume \
    --log-interval 10 "$@"
