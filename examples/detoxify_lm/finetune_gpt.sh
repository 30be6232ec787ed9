#!/usr/bin/env bash
# Detoxify a pretrained GPT by domain-adaptive finetuning on the least-toxic
# half of its own generations (SGEAT; reference examples/detxoify_lm/).
#
# Stage 1  self-generate   : sample unconditionally from the checkpoint
# Stage 2  filter          : keep the least-toxic fraction
# Stage 3  tokenize        : jsonl -> indexed dataset
# Stage 4  finetune        : continue training on the filtered corpus
#
# Usage: CKPT=/path/to/ckpt bash examples/detoxify_lm/finetune_gpt.sh
set -euo pipefail
cd "$(dirname "$0")/../.."

CKPT=${CKPT:?set CKPT to the pretrained GPT orbax checkpoint root}
OUT=${OUT:-/tmp/detoxify}
MODEL_FLAGS=${MODEL_FLAGS:-"--num-layers 12 --hidden-size 768 --num-heads 12 \
  --seq-length 1024 --vocab-size 49408"}
mkdir -p "$OUT"

# 1) self-generation (nucleus sampling, the reference's setting)
python tools/generate_samples_gpt.py $MODEL_FLAGS \
  --load "$CKPT" --genfile "$OUT/selfgen.jsonl" \
  --num-samples "${NUM_SAMPLES:-1000}" --out-seq-length 256 --top-p 0.9

# 2) keep the least-toxic half (annotate selfgen.jsonl with real scores
#    between stages 1 and 2 to use Perspective/Detoxify instead of the
#    offline heuristic)
python examples/detoxify_lm/filter_selfgeneration.py \
  --data-path "$OUT/selfgen.jsonl" --out-path "$OUT/nontoxic.jsonl" \
  --keep-fraction 0.5

# 3) tokenize to an indexed dataset
python tools/preprocess_data.py --input "$OUT/nontoxic.jsonl" \
  --output-prefix "$OUT/nontoxic" --tokenizer clip-bpe --append-eod

# 4) domain-adaptive finetune from the checkpoint (low LR, short schedule)
python pretrain_gpt.py $MODEL_FLAGS \
  --data-path "$OUT/nontoxic" \
  --load "$CKPT" --finetune --save "$OUT/ckpt_detox" \
  --train-steps "${TRAIN_STEPS:-500}" --lr 2e-5 --warmup 50 \
  --batch-size "${BATCH_SIZE:-8}"
