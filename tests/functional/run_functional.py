#!/usr/bin/env python
"""Golden-value functional regression runner.

The reference's functional tests train BERT/GPT3 for 50 steps per parallel
config and compare scraped loss curves to committed expected-metrics JSON
with margins (tests/functional_tests/python_test_utils/test_ci_pipeline.py:
loss 0.05 / time 0.1). Same design here: deterministic tiny runs per
parallel config, losses compared against tests/functional/expected/*.json.

  python tests/functional/run_functional.py --update   # regenerate goldens
  python -m pytest tests/functional_test_golden.py     # CI comparison
"""
import argparse
import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).parent.parent.parent
sys.path.insert(0, str(ROOT))
EXPECTED_DIR = Path(__file__).parent / "expected"

LOSS_MARGIN = 0.05  # relative, matching test_ci_pipeline.py:46-50

CONFIGS = {
    "clip_dp8": ["--model", "test-tiny", "--dataset-type", "synthetic",
                 "--batch-size", "16", "--train-num-samples", "64",
                 "--epochs", "1", "--warmup", "2", "--log-interval", "1",
                 "--precision", "fp32", "--seed", "42"],
    "clip_tp2_fsdp2": ["--model", "test-tiny", "--dataset-type", "synthetic",
                       "--batch-size", "16", "--train-num-samples", "64",
                       "--epochs", "1", "--warmup", "2", "--log-interval", "1",
                       "--precision", "fp32", "--seed", "42",
                       "--tensor-model-parallel-size", "2",
                       "--fsdp-parallel-size", "2"],
    "clip_branch": ["--model", "test-tiny", "--dataset-type", "synthetic",
                    "--batch-size", "16", "--train-num-samples", "64",
                    "--epochs", "1", "--warmup", "2", "--log-interval", "1",
                    "--precision", "fp32", "--seed", "42",
                    "--extra-world-size", "4"],
}

GPT_CONFIGS = {
    "gpt_tp2": ["--num-layers", "2", "--hidden-size", "64", "--num-heads",
                "4", "--seq-length", "32", "--vocab-size", "256",
                "--batch-size", "8", "--train-steps", "4", "--warmup", "2",
                "--precision", "fp32", "--log-interval", "1", "--seed", "42",
                "--tensor-model-parallel-size", "2"],
}


def run_config(name):
    if name.startswith("clip"):
        from megatron_clip_tpu.training.params import parse_args
        from megatron_clip_tpu.training.loop import run_training
        m = run_training(parse_args(CONFIGS[name]))
    else:
        from pretrain_gpt import parse_args, run
        m = run(parse_args(GPT_CONFIGS[name]))
    return {"final_loss": round(float(m["loss"]), 6)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--update", action="store_true",
                   help="regenerate the expected-metrics files")
    p.add_argument("--configs", default=None)
    args = p.parse_args(argv)
    names = (args.configs.split(",") if args.configs
             else list(CONFIGS) + list(GPT_CONFIGS))
    EXPECTED_DIR.mkdir(exist_ok=True)
    failures = []
    for name in names:
        got = run_config(name)
        path = EXPECTED_DIR / f"{name}.json"
        if args.update or not path.is_file():
            path.write_text(json.dumps(got, indent=1))
            print(f"{name}: wrote golden {got}")
            continue
        want = json.loads(path.read_text())
        rel = abs(got["final_loss"] - want["final_loss"]) / max(
            abs(want["final_loss"]), 1e-9)
        status = "OK" if rel <= LOSS_MARGIN else "FAIL"
        print(f"{name}: got {got['final_loss']} want {want['final_loss']} "
              f"rel {rel:.4f} -> {status}")
        if status == "FAIL":
            failures.append(name)
    if failures:
        raise SystemExit(f"golden regression failures: {failures}")


if __name__ == "__main__":
    main()
