#!/bin/bash
# Supervised retriever finetune on DPR-style (question, positive-context)
# pairs with in-batch negatives (examples/finetune_retriever_distributed.sh).
set -euo pipefail

TRAIN=${TRAIN:?"DPR-style JSON train file"}
VOCAB=${VOCAB:?"BERT wordpiece vocab.txt"}
CKPT=${CKPT:-}          # ICT-pretrained biencoder to start from
SAVE=${SAVE:-ckpts/retriever}

python -m tasks.main --task orqa-finetune \
    --qa-train-file "$TRAIN" --vocab-file "$VOCAB" \
    ${CKPT:+--load "$CKPT"} --save-to "$SAVE" \
    --num-layers 12 --hidden-size 768 --num-heads 12 \
    --seq-len 512 --batch-size 128 --epochs 2 --lr 2e-5 "$@"
