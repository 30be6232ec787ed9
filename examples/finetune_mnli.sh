#!/bin/bash
# MNLI (GLUE) finetune (examples/finetune_mnli_distributed.sh)
set -euo pipefail

TRAIN=${TRAIN:?"MNLI train TSV"}
DEV=${DEV:?"MNLI dev TSV"}
VOCAB=${VOCAB:?"BERT wordpiece vocab.txt"}
CKPT=${CKPT:-}

python -m tasks.main --task glue \
    --train-file "$TRAIN" --dev-file "$DEV" --vocab-file "$VOCAB" \
    ${CKPT:+--load "$CKPT"} --num-classes 3 \
    --num-layers 24 --hidden-size 1024 --num-heads 16 \
    --seq-len 128 --epochs 3 --lr 5e-5 --batch-size 64 "$@"
