#!/bin/bash
# Parallelism/microbatch sweep (the reference's grid_search.py +
# zPretrain ladder): tries tp/pp/mb combinations and reports step time.
set -euo pipefail
python tools/grid_search.py \
    --model ViT-B-32 --batch-size 256 --steps 10 \
    --tp 1,2 --pp 1,2 --microbatches 2,4,8 "$@"
