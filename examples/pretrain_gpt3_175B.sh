#!/bin/bash
# GPT-3 175B-shaped config (examples/pretrain_gpt3_175B.sh): the full-mesh
# flag set for a multi-pod run — tensor parallel inside a slice, pipeline
# over stages, data parallel across slices over DCN
# (--dcn-data-parallel-size), bf16 + selective recompute + batch rampup.
# Shrink the mesh sizes to the devices you actually have; on one chip this
# config is a flag-surface illustration, not a runnable model.
set -euo pipefail

DATA=${DATA:?"indexed corpus prefix (.bin/.idx)"}
SAVE=${SAVE:-ckpts/gpt3_175b}

python pretrain_gpt.py \
    --num-layers 96 --hidden-size 12288 --num-heads 96 \
    --seq-length 2048 --max-position-embeddings 2048 \
    --vocab-size 51200 --make-vocab-size-divisible-by 128 \
    --data-path "$DATA" --save "$SAVE" --resume \
    --tensor-model-parallel-size 8 --pipeline-model-parallel-size 8 \
    --fsdp-parallel-size 4 --dcn-data-parallel-size 4 \
    --sequence-parallel --micro-batch-size 1 \
    --batch-size 1536 --rampup-batch-size 32 32 4882812 \
    --train-samples 146484375 \
    --lr 6e-5 --min-lr 6e-6 --lr-decay-style cosine \
    --lr-warmup-fraction 0.001 \
    --adam-beta2 0.95 --weight-decay 0.1 --grad-clip-norm 1.0 \
    --precision bf16 --recompute-granularity selective \
    --attention-dropout 0.0 --hidden-dropout 0.0 \
    --eval-interval 2000 --save-interval 2000 --log-interval 10 "$@"
