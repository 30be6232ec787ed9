#!/bin/bash
# MSDP stage-0 (examples/msdp/data_processing.sh): raw Wizard-of-Wikipedia /
# Wizard-of-Internet dumps -> tab-separated `topic \t context \t knowledge
# \t response` files + knowledge/response reference files, then the
# few-shot prompt banks for both generation stages.
set -euo pipefail

WOW_RAW=${WOW_RAW:?"WoW raw json (train/valid/test)"}
OUT=${OUT:-msdp_data}
mkdir -p "$OUT"

python -m tasks.msdp_preprocess process-wow \
    --raw-file "$WOW_RAW" \
    --processed-file "$OUT/test_processed.txt" \
    --knwl-ref-file "$OUT/knowledge_reference.txt" \
    --resp-ref-file "$OUT/response_reference.txt"

# knowledge-generation prompt bank (stage-1 few-shot examples)
python -m tasks.msdp_preprocess knowledge-prompts \
    --test-file "$OUT/test_processed.txt" \
    --train-file "${TRAIN_PROCESSED:-$OUT/test_processed.txt}" \
    --data-type "${DATA_TYPE:-wow_seen}" \
    --processed-file "$OUT/knowledge_prompts.json" "$@"

# response-generation prompt bank (stage-2 few-shot examples)
python -m tasks.msdp_preprocess response-prompts \
    --train-file "${TRAIN_PROCESSED:-$OUT/test_processed.txt}" \
    --processed-file "$OUT/response_prompts.txt"
