#!/bin/bash
# Parallel-layout scaling sweeps (the examples/sc21 run_table/figure family):
# throughput across TP / FSDP / PP / microbatch / recompute grids, one JSON
# line per config + a best-config summary. Figures land in sweep_*.jsonl.
#
#   ./examples/scaling_sweep.sh tp        # throughput vs TP width
#   ./examples/scaling_sweep.sh pp        # throughput vs pipeline depth
#   ./examples/scaling_sweep.sh mb        # throughput vs microbatch count
#   ./examples/scaling_sweep.sh recompute # throughput vs remat policy
#   ./examples/scaling_sweep.sh all       # full cross product
set -euo pipefail

MODEL=${MODEL:-ViT-B-32}
BATCH=${BATCH:-256}
STEPS=${STEPS:-6}
SWEEP=${1:-all}

case "$SWEEP" in
  tp)        ARGS=(--tp 1,2,4,8 --fsdp 1 --pp 1 --recompute none) ;;
  fsdp)      ARGS=(--tp 1 --fsdp 1,2,4,8 --pp 1 --recompute none) ;;
  pp)        ARGS=(--tp 1 --fsdp 1 --pp 1,2,4 --microbatches 4 \
                   --recompute none) ;;
  mb)        ARGS=(--tp 1 --fsdp 1 --pp 2 --microbatches 2,4,8,16 \
                   --recompute none) ;;
  recompute) ARGS=(--tp 1 --fsdp 2 --pp 1 --recompute none,selective,full) ;;
  all)       ARGS=(--tp 1,2 --fsdp 1,2 --pp 1,2 --microbatches 1,4 \
                   --recompute none,selective) ;;
  *) echo "unknown sweep '$SWEEP' (tp|fsdp|pp|mb|recompute|all)"; exit 2 ;;
esac

python tools/grid_search.py --model "$MODEL" --batch-size "$BATCH" \
    --steps "$STEPS" "${ARGS[@]}" --out "sweep_${SWEEP}.jsonl"
