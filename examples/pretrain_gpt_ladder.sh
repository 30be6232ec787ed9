#!/usr/bin/env bash
# The measured single-chip (v5e, 16G) GPT MFU ladder — README "Performance".
# Each rung is the best-known config; tokens/s and MFU printed per run.
#   345m: 41.4% MFU / 38.2k tok/s   760m: 54.6% / 23.6k   1.3b: 55.0% / 13.7k
set -e
cd "$(dirname "$0")/.."

case "${1:-345m}" in
  345m)
    python pretrain_gpt.py --num-layers 24 --hidden-size 1024 --num-heads 16 \
        --seq-length 2048 --batch-size 8 --recompute-granularity selective \
        --params-dtype bf16 --loss-seq-chunk 512 \
        --train-steps "${STEPS:-50}" --log-interval 5 ;;
  760m)
    python pretrain_gpt.py --num-layers 24 --hidden-size 1536 --num-heads 16 \
        --seq-length 2048 --batch-size 4 --recompute-granularity selective \
        --params-dtype bf16 --loss-seq-chunk 1024 \
        --train-steps "${STEPS:-50}" --log-interval 5 ;;
  1.3b)
    # fully-bf16 train state + donation is what fits 1.3b on one chip
    python pretrain_gpt.py --num-layers 24 --hidden-size 2048 --num-heads 16 \
        --seq-length 2048 --batch-size 4 --recompute-granularity mlp \
        --params-dtype bf16 --nu-dtype bf16 --loss-seq-chunk 512 \
        --train-steps "${STEPS:-50}" --log-interval 5 ;;
  *)
    echo "usage: $0 {345m|760m|1.3b}  [STEPS=n]" >&2; exit 1 ;;
esac
