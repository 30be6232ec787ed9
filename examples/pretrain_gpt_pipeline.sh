#!/bin/bash
# GPT with interleaved pipeline parallelism + dropout (megatron defaults):
# pp4 x vpp2, 16 microbatches, tp2 — the 1F1B/interleaved config family
# (zPretrain/pretrain_{full,none,selective}.sh recompute ladder).
set -euo pipefail

REMAT=${REMAT:-selective}   # none | selective | full

python pretrain_gpt.py \
    --num-layers 32 --hidden-size 2048 --num-heads 16 \
    --seq-length 2048 --vocab-size 50304 \
    --batch-size 128 --train-steps 100000 --warmup 2000 \
    --precision bf16 --recompute-granularity "$REMAT" \
    --attention-dropout 0.1 --hidden-dropout 0.1 \
    --pipeline-model-parallel-size 4 \
    --virtual-pipeline-parallel-size 2 \
    --num-microbatches 16 \
    --tensor-model-parallel-size 2 \
    --fused-ce \
    --save ./checkpoints/gpt-pp --save-interval 1000 --resume \
    --log-interval 10 "$@"
