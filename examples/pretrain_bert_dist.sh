#!/bin/bash
# BERT pretraining (zPretrain/pretrain_bert.sh shape): real sentence-pair
# corpus, tp2 x dp, pipeline over 2 stages, save/resume + eval.
set -euo pipefail

DATA=${DATA:-}            # sentence-level indexed corpus prefix

python pretrain_bert.py \
    --num-layers 24 --hidden-size 1024 --num-heads 16 \
    --seq-length 512 --vocab-size 30592 \
    --batch-size 256 --train-steps 100000 --warmup 10000 \
    --lr 1e-4 --precision bf16 \
    --tensor-model-parallel-size 2 \
    --pipeline-model-parallel-size 2 --num-microbatches 8 \
    ${DATA:+--data-path "$DATA"} \
    --save ./checkpoints/bert --save-interval 1000 --resume \
    --eval-interval 1000 \
    --log-interval 10 "$@"
