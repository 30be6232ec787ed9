#!/usr/bin/env python
"""Measure pipeline activation memory vs microbatch count at ViT-H depth.

VERDICT r2 asked for proof of the liveness claim in parallel/pipeline.py:
GPipe-storage bounded by remat, flat in M (the reference's 1F1B keeps <=S
microbatches live, schedules.py:1043). This compiles the grad of the
pipelined ViT-H-depth tower (32 layers, width 1280, heads 16, seq 257,
bf16 activations — the real training shapes) for several M and reports the
per-device buffer analysis:

  python tools/pipeline_memory.py [--stages 4] [--mb 4 8 16 32]

Off-TPU this uses the CPU backend's buffer assignment over an 8-virtual-
device mesh — not HBM-exact, but the *scaling* in M is the property under
test (the buffer liveness analysis is backend-independent XLA logic).
"""
import argparse
import json
import os
import sys

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
import jax

if os.environ.get("MCT_FORCE_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", type=int, default=4)
    p.add_argument("--mb", type=int, nargs="+", default=[4, 8, 16, 32])
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--seq", type=int, default=257)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--remat", default="full")
    args = p.parse_args()

    from megatron_clip_tpu.config import ParallelCfg, TransformerCfg
    from megatron_clip_tpu.nn.transformer import init_transformer
    from megatron_clip_tpu.parallel import build_mesh
    from megatron_clip_tpu.parallel.pipeline import pipeline_transformer

    cfg = TransformerCfg(layers=args.layers, width=args.width,
                         heads=args.heads, remat=args.remat,
                         use_flash=False)
    blocks = init_transformer(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    x = jnp.zeros((args.batch, args.seq, args.width), jnp.bfloat16)

    results = []
    for m in args.mb:
        mesh = build_mesh(ParallelCfg(pp=args.stages, microbatches=m))

        def loss(b):
            return jnp.sum(pipeline_transformer(
                b, x, cfg, mesh=mesh, num_microbatches=m).astype(jnp.float32))

        compiled = jax.jit(jax.grad(loss)).lower(blocks).compile()
        ma = compiled.memory_analysis()
        row = {"microbatches": m,
               "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
               "arg_mb": round(ma.argument_size_in_bytes / 2**20, 1),
               "out_mb": round(ma.output_size_in_bytes / 2**20, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    base = results[0]["temp_mb"]
    worst = max(r["temp_mb"] for r in results)
    print(json.dumps({
        "shape": f"L{args.layers} w{args.width} s{args.seq} b{args.batch} "
                 f"pp{args.stages} remat={args.remat}",
        "temp_growth_vs_first": round(worst / max(base, 1e-9), 3),
        "flat_in_m": bool(worst <= base * 1.25),
    }))


if __name__ == "__main__":
    main()
