#!/bin/bash
# Zero-shot GPT evaluation (examples/evaluate_zeroshot_gpt.sh):
# wikitext-103 perplexity with overlapping eval, or LAMBADA cloze accuracy.
set -euo pipefail

TASK=${TASK:-wikitext103}     # wikitext103 | lambada
CKPT=${CKPT:-./checkpoints/gpt}
DATA=${DATA:?"set DATA to the eval file (wikitext txt / lambada jsonl)"}

python -m tasks.main --task "$TASK" \
    --load "$CKPT" --valid-data "$DATA" --overlapping-eval 32 \
    --num-layers 24 --hidden-size 1024 --num-heads 16 \
    --seq-len 1024 "$@"
