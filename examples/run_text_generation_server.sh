#!/bin/bash
# REST text-generation server (examples/run_text_generation_server_345M.sh)
set -euo pipefail

CKPT=${CKPT:-./checkpoints/gpt}

python tools/run_text_generation_server.py \
    --load "$CKPT" --port "${PORT:-5000}" "$@"
