#!/usr/bin/env python
"""Measure train-step throughput + MFU for any CLIP config on the local chip.

The generalization of the repo-root bench.py driver contract (which stays
pinned to the ViT-B/32 headline): use this for perf work on other ladder
rungs, remat/scan/batch sweeps, and optional profiler traces.

  python tools/bench_model.py --model ViT-L-14 --batch 64 --remat selective
  python tools/bench_model.py --model ViT-L-14 --trace /tmp/trace  # xprof dump
  python tools/bench_model.py --family gpt --gpt-size 345m --batch 8

The GPT family benches the megatron workload surface (pretrain_gpt.py path)
with the standard 6*N*T FLOPs/token accounting, comparable to the
Megatron-LM MFU ladder (BASELINE.md: 41.5% @ 22B .. 56.3% @ 1T on A100).
"""
import argparse
import dataclasses
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon sitecustomize force-registers the TPU plugin; env alone is
    # not enough to stay off the chip (see .claude/skills/verify)
    jax.config.update("jax_platforms", "cpu")


GPT_SIZES = {  # megatron paper ladder rungs that fit one 16G chip
    "tiny": dict(num_layers=2, hidden_size=128, num_heads=2,
                 vocab_size=1024),  # CPU smoke only
    "124m": dict(num_layers=12, hidden_size=768, num_heads=12),
    "345m": dict(num_layers=24, hidden_size=1024, num_heads=16),
    "760m": dict(num_layers=24, hidden_size=1536, num_heads=16),
    "1.3b": dict(num_layers=24, hidden_size=2048, num_heads=16),
}


def bench_gpt(args):
    import optax
    from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt, gpt_loss

    cfg = GPTCfg(seq_length=args.seq_len, **GPT_SIZES[args.gpt_size])
    pdtype = jnp.bfloat16 if args.params_dtype == "bf16" else jnp.float32
    params = init_gpt(jax.random.PRNGKey(0), cfg, dtype=pdtype)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    tcfg = cfg.transformer(remat=args.remat, scan_layers=args.scan_layers)
    if args.nu_dtype == "bf16":
        # fully-bf16 optimizer state: the 1.3b rung's fp32 nu alone is
        # 5.3 GB (training/optim.py adamw_lowbits)
        from megatron_clip_tpu.training.optim import adamw_lowbits
        inner = adamw_lowbits(1e-4, b1=0.9, b2=0.95)
    else:
        inner = optax.adamw(1e-4, b1=0.9, b2=0.95, mu_dtype=jnp.bfloat16)
    tx = optax.chain(optax.clip_by_global_norm(1.0), inner)
    opt = tx.init(params)

    # donate params+opt: without it XLA double-buffers the train state,
    # which alone OOMs the 1.3b rung (10.5 GB of bf16 state x2)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt, tokens):
        loss, g = jax.value_and_grad(
            lambda p: gpt_loss(p, tokens, cfg, tcfg=tcfg,
                               fused_ce=args.fused_ce,
                               loss_seq_chunk=args.loss_chunk))(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (args.batch, cfg.seq_length + 1), 1,
        cfg.vocab_size - 1).astype(jnp.int32)
    for _ in range(args.warmup):
        params, opt, loss = step(params, opt, tokens)
    float(loss)
    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt, loss = step(params, opt, tokens)
    loss = float(loss)
    dt = time.perf_counter() - t0
    if args.trace:
        jax.profiler.stop_trace()

    from bench import peak_flops_for
    toks_per_sec = args.batch * cfg.seq_length * args.iters / dt
    peak = peak_flops_for(jax.devices()[0])
    mfu = 6 * n_params * toks_per_sec / peak
    # HFU (megatron README reports MFU/HFU pairs): hardware FLOPs actually
    # executed per token — 6N plus the work 6N*T does not credit:
    #   tied lm-head reuse: the embedding matrix runs as a matmul too
    #   (fwd 2wV + bwd 4wV per token),
    #   causal attention score/apply: avg s/2 keys -> 6*s*w per layer
    #   (fwd 2sw, bwd 4sw),
    #   selective remat: attention internals recomputed in bwd (+2sw/layer).
    w, s, L = cfg.hidden_size, cfg.seq_length, cfg.num_layers
    extra = (6 * w * cfg.vocab_size if cfg.tie_embeddings else 0)
    extra += 6 * s * w * L
    if args.remat == "selective":
        extra += 2 * s * w * L
    elif args.remat == "mlp":
        # attention internals (as selective) + both MLP matmuls replayed
        extra += 2 * s * w * L + 16 * w * w * L
    elif args.remat == "full":
        extra += 2 * n_params + 2 * s * w * L
    hfu = (6 * n_params + extra) * toks_per_sec / peak
    print(json.dumps({
        "model": f"gpt-{args.gpt_size}", "batch": args.batch,
        "seq": cfg.seq_length, "params_m": round(n_params / 1e6, 1),
        "remat": args.remat, "mfu": round(mfu, 4), "hfu": round(hfu, 4),
        "tokens_per_sec": round(toks_per_sec, 0),
        "step_ms": round(1000 * dt / args.iters, 2), "loss": loss,
        "device": str(jax.devices()[0].device_kind),
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-L-14")
    p.add_argument("--precision", default="bf16",
                   help="clip-family precision (pure_bf16 = bf16 params)")
    p.add_argument("--family", choices=["clip", "gpt"], default="clip")
    p.add_argument("--gpt-size", choices=sorted(GPT_SIZES), default="345m")
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--loss-chunk", type=int, default=512,
                   help="sequence-chunked lm-head loss (0 = full logits)")
    p.add_argument("--fused-ce", action="store_true",
                   help="fused lm-head+CE Pallas kernel (logits never in "
                        "HBM; ops/pallas/fused_ce.py)")
    p.add_argument("--nu-dtype", choices=["fp32", "bf16"], default="fp32",
                   help="adam second-moment storage (bf16 halves it; "
                        "needed for the 1.3b rung on one chip)")
    p.add_argument("--params-dtype", choices=["fp32", "bf16"], default="fp32",
                   help="bf16 = pure-bf16 params/optimizer state (fits "
                        "760m-class models on one 16G chip)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--remat", choices=["none", "selective", "mlp", "full"],
                   default="selective")
    p.add_argument("--scan-layers", action="store_true")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--mu-dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--trace", default=None,
                   help="dump a jax.profiler trace dir for xprof")
    args = p.parse_args()

    if args.family == "gpt":
        return bench_gpt(args)

    from bench import clip_train_flops_per_image, peak_flops_for
    from megatron_clip_tpu.factory import create_model
    from megatron_clip_tpu.training import (
        make_optimizer, cosine_lr, make_train_step)
    from megatron_clip_tpu.training.train_step import TrainState

    model, params = create_model(args.model, precision=args.precision, seed=0)
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
