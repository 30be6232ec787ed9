#!/bin/bash
# MSDP stage-1 (examples/msdp/prompt_knwl_gen.sh): few-shot prompt a
# pretrained GPT to generate the context-relevant knowledge sentence for
# each dialogue turn. Generation runs locally through the jitted KV-cache
# decoder, or against a REST server when API_URL is set.
set -euo pipefail

INPUT=${INPUT:?"processed test file (topic\\tcontext\\tknowledge)"}
PROMPTS=${PROMPTS:?"knowledge_prompts.json from data_processing.sh"}
OUTPUT=${OUTPUT:-knowledge_generations.txt}
CKPT=${CKPT:-}          # 345m GPT checkpoint root
VOCAB=${VOCAB:-}        # gpt2 vocab.json
MERGE=${MERGE:-}        # gpt2 merges.txt
API_URL=${API_URL:-}    # e.g. http://localhost:5000/api

python -m tasks.main --task msdp-prompt --prompt-type knowledge \
    --sample-input-file "$INPUT" --sample-output-file "$OUTPUT" \
    --prompt-file "$PROMPTS" --num-prompt-examples 10 \
    ${CKPT:+--load "$CKPT"} ${VOCAB:+--vocab-file "$VOCAB"} \
    ${MERGE:+--merge-file "$MERGE"} \
    ${API_URL:+--megatron-api-url "$API_URL"} \
    --num-layers 24 --hidden-size 1024 --num-heads 16 \
    --seq-len 2048 --out-seq-length 32 "$@"
