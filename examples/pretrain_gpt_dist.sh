#!/bin/bash
# GPT pretraining on a TPU slice: tp2 x fsdp2 x dp, sequence parallelism,
# fused lm-head CE, checkpoint/resume + periodic eval (the zPretrain GPT
# launcher shape on the TPU mesh runtime).
set -euo pipefail

DATA=${DATA:-}            # indexed corpus prefix (.bin/.idx); synthetic if empty
SAVE=${SAVE:-./checkpoints/gpt}

python pretrain_gpt.py \
    --num-layers 24 --hidden-size 1024 --num-heads 16 \
    --seq-length 2048 --vocab-size 50304 \
    --position-embedding rope --swiglu --normalization rmsnorm \
    --batch-size 64 --train-steps 100000 --warmup 2000 \
    --lr 3e-4 --weight-decay 0.1 \
    --precision bf16 --recompute-granularity selective \
    --fused-ce \
    --tensor-model-parallel-size 2 --fsdp-parallel-size 2 \
    --sequence-parallel \
    ${DATA:+--data-path "$DATA"} \
    --save "$SAVE" --save-interval 1000 --resume \
    --eval-interval 1000 --eval-iters 20 \
    --log-interval 10 "$@"
