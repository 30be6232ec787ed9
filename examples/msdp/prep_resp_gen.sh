#!/bin/bash
# MSDP stage-1.5 (examples/msdp/prep_resp_gen.sh): merge the generated
# knowledge back into the test file so stage-2 response generation can
# condition on it.
set -euo pipefail

TEST=${TEST:?"processed test file"}
KNWL=${KNWL:?"stage-1 knowledge generations"}
OUT=${OUT:-response_input.txt}

python -m tasks.msdp_preprocess prepare-input \
    --test-file "$TEST" --knwl-gen-file "$KNWL" \
    --processed-file "$OUT" "$@"
