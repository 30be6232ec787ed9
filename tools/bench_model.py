#!/usr/bin/env python
"""Measure train-step throughput + MFU for any CLIP config on the local chip.

The generalization of the repo-root bench.py driver contract (which stays
pinned to the ViT-B/32 headline): use this for perf work on other ladder
rungs, remat/scan/batch sweeps, and optional profiler traces.

  python tools/bench_model.py --model ViT-L-14 --batch 64 --remat selective
  python tools/bench_model.py --model ViT-L-14 --trace /tmp/trace  # xprof dump
"""
import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-L-14")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--remat", choices=["none", "selective", "full"],
                   default="selective")
    p.add_argument("--scan-layers", action="store_true")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--mu-dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--trace", default=None,
                   help="dump a jax.profiler trace dir for xprof")
    args = p.parse_args()

    from bench import clip_train_flops_per_image, peak_flops_for
    from megatron_clip_tpu.factory import create_model
    from megatron_clip_tpu.training import (
        make_optimizer, cosine_lr, make_train_step)
    from megatron_clip_tpu.training.train_step import TrainState

    model, params = create_model(args.model, precision="bf16", seed=0)
    model = dataclasses.replace(model, remat=args.remat,
                                scan_layers=args.scan_layers)
    mu = jnp.bfloat16 if args.mu_dtype == "bf16" else None
    tx = make_optimizer(params, cosine_lr(1e-3, 100, 10000),
                        grad_clip_norm=1.0, moment_dtype=mu)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx)

    cfg = model.cfg
    key = jax.random.PRNGKey(0)
    images = jax.random.normal(key, (args.batch, cfg.vision.image_size,
                                     cfg.vision.image_size, 3), jnp.float32)
    texts = jax.random.randint(key, (args.batch, cfg.text.context_length), 1,
                               cfg.text.vocab_size - 2).astype(jnp.int32)

    for _ in range(args.warmup):
        state, metrics = step(state, images, texts)
    float(metrics["loss"])

    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, images, texts)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    if args.trace:
        jax.profiler.stop_trace()

    ips = args.batch * args.iters / dt
    mfu = ips * clip_train_flops_per_image(cfg) / \
        peak_flops_for(jax.devices()[0])
    print(json.dumps({
        "model": args.model, "batch": args.batch, "remat": args.remat,
        "scan": args.scan_layers, "mfu": round(mfu, 4),
        "images_per_sec": round(ips, 1),
        "step_ms": round(1000 * dt / args.iters, 2), "loss": loss,
        "device": str(jax.devices()[0].device_kind),
    }))


if __name__ == "__main__":
    main()
