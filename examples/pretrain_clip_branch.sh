#!/bin/bash
# Branch-parallel CLIP pretraining (the zPretrain/pretrain_clip.sh topology:
# main branch vision tower TP1/PP4, extra branch text tower TP2/PP2 on 8
# extra devices) on a 16-device TPU slice.
set -euo pipefail

DATA=${DATA:-"/data/cc3m/{00000..00331}.tar"}
NUM_SAMPLES=${NUM_SAMPLES:-2905954}
SAVE=${SAVE:-./checkpoints}

python pretrain_clip.py \
    --model ViT-L-14 \
    --train-data "$DATA" \
    --train-num-samples "$NUM_SAMPLES" \
    --dataset-type webdataset \
    --batch-size 4096 \
    --epochs 32 \
    --lr 5e-4 --warmup 2000 --wd 0.2 --beta2 0.98 \
    --precision bf16 \
    --recompute-granularity selective \
    --pipeline-model-parallel-size 4 \
    --num-microbatches 8 \
    --extra-world-size 8 \
    --xtensor-model-parallel-size 2 \
    --xpipeline-model-parallel-size 2 \
    --save "$SAVE" --name clip-branch --resume latest \
    --save-interval 1000 \
    --report-to tensorboard \
    --log-interval 10 "$@"
