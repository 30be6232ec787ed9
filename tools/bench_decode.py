#!/usr/bin/env python
"""Serving-side decode throughput bench: prefill + KV-cache decode tok/s.

The training benches (bench.py, tools/bench_model.py) cover the megatron
pretrain surface; this covers the text-generation service path
(inference/generation.py — the reference's tools/run_text_generation_server
workload). Reports per-sequence decode latency and aggregate generated
tokens/s for one compiled prefill+scan generation.

  python tools/bench_decode.py --gpt-size 345m --batch 8 \
      --prompt-len 128 --new-tokens 128
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from bench_model import GPT_SIZES  # noqa: E402  (tools/ sibling)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gpt-size", choices=sorted(GPT_SIZES), default="345m")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prompt-len", type=int, default=128)
    p.add_argument("--new-tokens", type=int, default=128)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--top-k", type=int, default=0,
                   help="0 = greedy (temperature 0)")
    p.add_argument("--int8", action="store_true",
                   help="int8 decode weights (quantize_decode_weights): "
                        "halves the weight-streaming bound")
    args = p.parse_args()

    from megatron_clip_tpu.models.gpt import GPTCfg, init_gpt
    from megatron_clip_tpu.inference.generation import generate

    cfg = GPTCfg(seq_length=args.prompt_len + args.new_tokens,
                 **GPT_SIZES[args.gpt_size])
    params = init_gpt(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    if args.int8:
        from megatron_clip_tpu.ops.quant import quantize_decode_weights
        params = quantize_decode_weights(params)

    prompt = jax.random.randint(jax.random.PRNGKey(1),
                                (args.batch, args.prompt_len), 1,
                                cfg.vocab_size - 1).astype(jnp.int32)
    plen = jnp.full((args.batch,), args.prompt_len, jnp.int32)

    # params must be a jit ARGUMENT: closing over them bakes the weights
    # into the computation as constants (the axon remote-compile request
    # then ships the whole model body — HTTP 413)
    run = jax.jit(lambda ps, pr, pl: generate(
        ps, pr, pl, cfg, max_new_tokens=args.new_tokens,
        temperature=0.0 if args.top_k == 0 else 1.0, top_k=args.top_k))

    for _ in range(max(1, args.warmup)):     # >=1: sync below needs `out`
        out = run(params, prompt, plen)
    int(out[0, -1])   # scalar fetch: the only reliable sync on axon
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(params, prompt, plen)
    # device executes dispatches in order, so fetching from the last call
    # bounds all of them (block_until_ready is a no-op on the axon backend)
    int(out[0, -1])
    dt = (time.perf_counter() - t0) / args.iters

    new_toks = args.batch * args.new_tokens
    print(json.dumps({
        "model": f"gpt-{args.gpt_size}" + ("-int8" if args.int8 else ""),
        "params_m": round(n_params / 1e6, 1),
        "batch": args.batch, "prompt_len": args.prompt_len,
        "new_tokens": args.new_tokens,
        "gen_tokens_per_sec": round(new_toks / dt, 1),
        "ms_per_token": round(1000 * dt / args.new_tokens, 3),
        "seq_latency_ms": round(1000 * dt, 1),
        "device": str(jax.devices()[0].device_kind),
    }))


if __name__ == "__main__":
    main()
