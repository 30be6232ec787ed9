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
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--train-steps", type=int, default=20)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--retro-prefix", type=str, default=None,
                   help="prefix written by tools/retro_build.py")
    p.add_argument("--log-interval", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def run(args):
    from megatron_clip_tpu.models.gpt import GPTCfg
    from megatron_clip_tpu.models.retro import (
        RetroCfg, init_retro, retro_loss)
    from megatron_clip_tpu.training.simple_loop import simple_train

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

    m = args.chunk_length
    l = args.seq_length // m
    k = args.num_neighbors
    rng = np.random.RandomState(args.seed)

    def batches():
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
            while True:
                idx = rng.choice(starts, size=args.batch_size)
                toks = np.stack([chunks[i:i + l].reshape(-1) for i in idx])
                nb = np.stack([nbrs[i:i + l] for i in idx])
                yield jnp.asarray(toks, jnp.int32), jnp.asarray(nb, jnp.int32)
        else:
            # synthetic retrieval task respecting the causal offset: each
            # chunk repeats one random token; neighbor 0 of chunk u carries
            # chunk u+1's token in its continuation half, so the otherwise
            # unpredictable first token of every chunk (after the first) is
            # recoverable only through the CCA path
            while True:
                sym = rng.randint(4, args.vocab_size, (args.batch_size, l))
                pat = np.repeat(sym[:, :, None], m, axis=2)
                toks = pat.reshape(args.batch_size, l * m)
                nb = rng.randint(4, args.vocab_size,
                                 (args.batch_size, l, k, 2 * m))
                nb[:, :, 0, :m] = pat
                nb[:, :-1, 0, m:] = pat[:, 1:]
                yield (jnp.asarray(toks, jnp.int32),
                       jnp.asarray(nb, jnp.int32))

    def loss_fn(p, batch):
        toks, nb = batch
        return retro_loss(p, toks, nb, cfg, compute_dtype=compute)

    out = simple_train(params, loss_fn, batches(), args.train_steps,
                       lr=args.lr, warmup=args.warmup,
                       log_interval=args.log_interval, name="retro")
    return {"loss": out["loss"]}


if __name__ == "__main__":
    run(parse_args())
