#!/bin/bash
# T5 pretraining (examples/pretrain_t5_distributed_with_mp.sh shape):
# span-corruption over an indexed corpus, tp2 x fsdp2, save/resume + eval.
set -euo pipefail

DATA=${DATA:-}            # sentence-level indexed corpus prefix

python pretrain_t5.py \
    --num-layers 12 --num-decoder-layers 12 --hidden-size 768 \
    --num-heads 12 --encoder-seq-length 512 --decoder-seq-length 128 \
    --vocab-size 30592 --masked-lm-prob 0.15 \
    --batch-size 64 --train-steps 100000 --warmup 10000 \
    --lr 1e-4 --precision bf16 \
    --tensor-model-parallel-size 2 --fsdp-parallel-size 2 \
    ${DATA:+--data-path "$DATA"} \
    --save ./checkpoints/t5 --save-interval 1000 --resume \
    --eval-interval 1000 \
    --log-interval 10 "$@"
