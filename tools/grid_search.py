#!/usr/bin/env python
"""Parallel-layout grid search.

The reference's grid_search.py sweeps TP/DP/PP/microbatch/recompute configs
via sbatch and scrapes logs for iteration time/memory. Here each config runs
in-process on the local devices and reports samples/s directly.

  python tools/grid_search.py --model test-tiny --batch-size 64 \
      --tp 1,2 --fsdp 1,2 --pp 1 --steps 4
"""
import argparse
import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="test-tiny")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--tp", default="1,2")
    p.add_argument("--fsdp", default="1")
    p.add_argument("--pp", default="1")
    p.add_argument("--microbatches", default="1")
    p.add_argument("--recompute", default="none,selective")
    p.add_argument("--precision", default="bf16")
    p.add_argument("--out", default=None, help="jsonl results file")
    args = p.parse_args(argv)

    from megatron_clip_tpu.training.params import parse_args as clip_args
    from megatron_clip_tpu.training.loop import run_training

    grid = list(itertools.product(
        [int(x) for x in args.tp.split(",")],
        [int(x) for x in args.fsdp.split(",")],
        [int(x) for x in args.pp.split(",")],
        [int(x) for x in args.microbatches.split(",")],
        args.recompute.split(",")))
    results = []
    for tp, fsdp, pp, mb, rc in grid:
        tag = f"tp{tp}_fsdp{fsdp}_pp{pp}_mb{mb}_{rc}"
        argv2 = ["--model", args.model, "--dataset-type", "synthetic",
                 "--batch-size", str(args.batch_size),
                 "--train-num-samples", str(args.batch_size * args.steps),
                 "--epochs", "1", "--warmup", "1", "--log-interval", "1",
                 "--precision", args.precision,
                 "--tensor-model-parallel-size", str(tp),
                 "--fsdp-parallel-size", str(fsdp),
                 "--pipeline-model-parallel-size", str(pp),
                 "--num-microbatches", str(mb),
                 "--recompute-granularity", rc]
        try:
            t0 = time.perf_counter()
            m = run_training(clip_args(argv2))
            rec = {"config": tag, "samples_per_s": m.get("samples_per_s"),
                   "loss": m.get("loss"),
                   "wall_s": round(time.perf_counter() - t0, 1)}
        except Exception as e:  # noqa: BLE001 — sweep keeps going
            rec = {"config": tag, "error": str(e)[:200]}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    ok = [r for r in results if "samples_per_s" in r and r["samples_per_s"]]
    if ok:
        best = max(ok, key=lambda r: r["samples_per_s"])
        print(f"# best: {best['config']} @ {best['samples_per_s']:.1f} samples/s",
              flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")
    return results


if __name__ == "__main__":
    main()
