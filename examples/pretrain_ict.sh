#!/bin/bash
# ICT / biencoder pretraining (examples/pretrain_ict.sh shape): inverse
# cloze task over a sentence-indexed corpus with document titles.
set -euo pipefail

DATA=${DATA:-}            # sentence-level indexed corpus prefix
TITLES=${TITLES:-}        # titles indexed corpus prefix

python pretrain_ict.py \
    --num-layers 12 --hidden-size 768 --num-heads 12 \
    --seq-length 256 --vocab-size 30592 --projection-dim 128 \
    --batch-size 128 --train-steps 100000 --warmup 10000 \
    --lr 1e-4 --precision bf16 \
    --tensor-model-parallel-size 2 \
    ${DATA:+--data-path "$DATA"} ${TITLES:+--titles-data-path "$TITLES"} \
    --save ./checkpoints/ict --save-interval 1000 --resume \
    --log-interval 10 "$@"
