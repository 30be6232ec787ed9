#!/bin/bash
# MSDP stage-2 (examples/msdp/prompt_resp_gen.sh): few-shot prompt the LM
# to generate the dialogue response given context + generated knowledge.
set -euo pipefail

INPUT=${INPUT:?"response_input.txt from prep_resp_gen.sh"}
PROMPTS=${PROMPTS:?"response_prompts.txt from data_processing.sh"}
OUTPUT=${OUTPUT:-response_generations.txt}
CKPT=${CKPT:-}
VOCAB=${VOCAB:-}
MERGE=${MERGE:-}
API_URL=${API_URL:-}

python -m tasks.main --task msdp-prompt --prompt-type response \
    --sample-input-file "$INPUT" --sample-output-file "$OUTPUT" \
    --prompt-file "$PROMPTS" --num-prompt-examples 10 \
    ${CKPT:+--load "$CKPT"} ${VOCAB:+--vocab-file "$VOCAB"} \
    ${MERGE:+--merge-file "$MERGE"} \
    ${API_URL:+--megatron-api-url "$API_URL"} \
    --num-layers 24 --hidden-size 1024 --num-heads 16 \
    --seq-len 2048 --out-seq-length 64 "$@"
