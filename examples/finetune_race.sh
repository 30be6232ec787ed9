#!/bin/bash
# RACE multiple-choice finetune (examples/finetune_race_distributed.sh)
set -euo pipefail

TRAIN=${TRAIN:?"RACE train JSONL"}
DEV=${DEV:?"RACE dev JSONL"}
VOCAB=${VOCAB:?"BERT wordpiece vocab.txt"}
CKPT=${CKPT:-}        # pretrained BERT orbax root

python -m tasks.main --task race \
    --train-file "$TRAIN" --dev-file "$DEV" --vocab-file "$VOCAB" \
    ${CKPT:+--load "$CKPT"} \
    --num-layers 24 --hidden-size 1024 --num-heads 16 \
    --seq-len 384 --epochs 3 --lr 1e-5 --batch-size 32 "$@"
