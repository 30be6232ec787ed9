#!/bin/bash
# MSDP eval (examples/msdp/eval_resp_generation.sh): token-level F1 of the
# generated responses against the reference responses.
set -euo pipefail

GUESS=${GUESS:?"stage-2 response generations"}
ANSWER=${ANSWER:?"response_reference.txt"}

python -m tasks.main --task msdp-eval-f1 \
    --guess-file "$GUESS" --answer-file "$ANSWER" "$@"
