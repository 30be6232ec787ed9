#!/bin/bash
# MSDP eval (examples/msdp/eval_knwl_generation.sh): token-level F1 of the
# generated knowledge against the reference knowledge sentences.
set -euo pipefail

GUESS=${GUESS:?"stage-1 knowledge generations"}
ANSWER=${ANSWER:?"knowledge_reference.txt"}

python -m tasks.main --task msdp-eval-f1 \
    --guess-file "$GUESS" --answer-file "$ANSWER" "$@"
