#!/usr/bin/env python
"""RETRO pretraining (reference: pretrain_retro.py): GPT with chunked
cross-attention over retrieved neighbors.

With --retro-prefix, trains on the db built by tools/retro_build.py
(sequences = runs of consecutive same-document chunks + their stored
neighbors). Without it, a synthetic copy task where each chunk's answer
tokens appear in its neighbors — retrieval must help, so falling loss
exercises the whole CCA path.
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("RETRO pretraining")
    p.add_argument("--num-layers", type=int, default=12)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--num-heads", type=int, default=12)
    p.add_argument("--vocab-size", type=int, default=50304)
    p.add_argument("--seq-length", type=int, default=512)
    p.add_argument("--chunk-length", type=int, default=64)
    p.add_argument("--num-neighbors", type=int, default=2)
    p.add_argument("--encoder-layers", type=int, default=2)
    p.add_argument("--cca-layers", type=int, nargs="+", default=None,
                   help="decoder layer indices with chunked cross-attn")
    p.add_argument("--precision", default="bf16")
    p.add_argument("--retro-prefix", type=str, default=None,
                   help="prefix written by tools/retro_build.py")
    from megatron_clip_tpu.training.workload import add_runtime_args
    add_runtime_args(p, lr=3e-4, batch_size=4, warmup=5)
    return p.parse_args(argv)


def run(args):
    from megatron_clip_tpu.training.workload import \
        maybe_apply_checkpoint_args
    args = maybe_apply_checkpoint_args(args)
    from megatron_clip_tpu.models.gpt import GPTCfg
    from megatron_clip_tpu.models.retro import (
        RetroCfg, init_retro, retro_loss)
    from megatron_clip_tpu.parallel.sharding import generic_param_specs
    from megatron_clip_tpu.training.workload import (
        runtime_cfg_from_args, build_workload_mesh, run_workload)

    cca = tuple(args.cca_layers) if args.cca_layers else tuple(
        range(args.num_layers // 2, args.num_layers, 3)) or (args.num_layers - 1,)
    cfg = RetroCfg(
        gpt=GPTCfg(num_layers=args.num_layers, hidden_size=args.hidden_size,
                   num_heads=args.num_heads, vocab_size=args.vocab_size,
                   seq_length=args.seq_length),
        chunk_length=args.chunk_length,
        retrieved_length=2 * args.chunk_length,
        num_neighbors=args.num_neighbors,
        encoder_layers=args.encoder_layers,
        cca_layers=cca)
    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32
    params = init_retro(jax.random.PRNGKey(args.seed), cfg)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"RETRO {n/1e6:.1f}M params, cca layers {cca}", flush=True)

    rc = runtime_cfg_from_args(args, "retro")
    if rc.pp > 1:
        raise SystemExit("RETRO does not support pipeline parallelism (the "
                         "chunked cross-attention needs the neighbor encoder "
                         "on every stage); use tp/fsdp/dp")
    mesh, _ = build_workload_mesh(rc)
    specs = generic_param_specs(params)

    m = args.chunk_length
    l = args.seq_length // m
    k = args.num_neighbors
    def batches(seed=args.seed, start_step=0):
        # per-step keyed rng everywhere: resume seeks O(1), no stream replay
        def _step_rng(step):
            return np.random.RandomState(
                (seed * 2654435761 + step) % (2 ** 31))
        if args.retro_prefix:
            chunks = np.load(args.retro_prefix + "_chunks.npy")
            docs = np.load(args.retro_prefix + "_chunk_docs.npy")
            nbrs = np.load(args.retro_prefix + "_neighbors.npy")
            # starts of l consecutive same-doc chunks
            starts = [i for i in range(len(chunks) - l + 1)
                      if docs[i] == docs[i + l - 1]]
            if not starts:
                raise SystemExit(f"no document has {l} consecutive chunks; "
                                 "reduce --seq-length")
            step = start_step
            while True:
                step += 1
                idx = _step_rng(step).choice(starts, size=args.batch_size)
                toks = np.stack([chunks[i:i + l].reshape(-1) for i in idx])
                nb = np.stack([nbrs[i:i + l] for i in idx])
                yield jnp.asarray(toks, jnp.int32), jnp.asarray(nb, jnp.int32)
        else:
            # synthetic retrieval task respecting the causal offset: each
            # chunk repeats one random token; neighbor 0 of chunk u carries
            # chunk u+1's token in its continuation half, so the otherwise
            # unpredictable first token of every chunk (after the first) is
            # recoverable only through the CCA path
            step = start_step
            while True:
                step += 1
                rng = _step_rng(step)
                sym = rng.randint(4, args.vocab_size, (args.batch_size, l))
                pat = np.repeat(sym[:, :, None], m, axis=2)
                toks = pat.reshape(args.batch_size, l * m)
                nb = rng.randint(4, args.vocab_size,
                                 (args.batch_size, l, k, 2 * m))
                nb[:, :, 0, :m] = pat
                nb[:, :-1, 0, m:] = pat[:, 1:]
                yield (jnp.asarray(toks, jnp.int32),
                       jnp.asarray(nb, jnp.int32))

    def loss_fn(p, batch, step_rng):
        toks, nb = batch
        return retro_loss(p, toks, nb, cfg, compute_dtype=compute)

    out = run_workload(params, loss_fn,
                       lambda start_step: batches(start_step=start_step),
                       rc, mesh=mesh,
                       param_specs=specs,
                       val_iter_factory=lambda: batches(args.seed + 7919), args_ns=args)
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
