#!/usr/bin/env python
"""Embed a text corpus with a (bi)encoder and build a MIPS index.

Reference: tools/bert_embedding/ (~730 LoC distributed BERT embedding) +
megatron/indexer.py. Reads a sentence-level indexed corpus (or a plain
text file, one block per line + a tokenizer), embeds blocks in jitted
batches with the biencoder context tower, writes <out>.npy/<out>.json, and
optionally answers a smoke query.

  python tools/bert_embedding.py --data-path corpus --out /tmp/blocks \
      --hidden-size 128 --num-layers 4 [--load ckpt]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser("bert embedding")
    p.add_argument("--data-path", required=True,
                   help="indexed corpus prefix (.bin/.idx)")
    p.add_argument("--out", required=True, help="output prefix")
    p.add_argument("--num-layers", type=int, default=4)
    p.add_argument("--hidden-size", type=int, default=128)
    p.add_argument("--num-heads", type=int, default=4)
    p.add_argument("--vocab-size", type=int, default=30592)
    p.add_argument("--seq-length", type=int, default=128)
    p.add_argument("--projection-dim", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--load", default=None, help="orbax checkpoint root")
    p.add_argument("--precision", default="bf16")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def run(args):
    import jax
    import jax.numpy as jnp
    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDataset
    from megatron_clip_tpu.indexer import embed_corpus, MIPSIndex
    from megatron_clip_tpu.models.bert import BertCfg
    from megatron_clip_tpu.models.biencoder import (
        BiencoderCfg, init_biencoder, encode_context)

    cfg = BiencoderCfg(
        bert=BertCfg(num_layers=args.num_layers,
                     hidden_size=args.hidden_size, num_heads=args.num_heads,
                     vocab_size=args.vocab_size, seq_length=args.seq_length,
                     add_binary_head=False),
        projection_dim=args.projection_dim)
    params = init_biencoder(jax.random.PRNGKey(args.seed), cfg)
    if args.load:
        from megatron_clip_tpu.checkpoints import load_checkpoint
        tree, _, _ = load_checkpoint(args.load, {"params": params})
        params = tree["params"]
    compute = jnp.bfloat16 if args.precision.startswith("bf") else jnp.float32

    ds = MMapIndexedDataset(args.data_path)

    def batches():
        buf = []
        for i in range(len(ds)):
            toks = np.asarray(ds[i], np.int32)[: args.seq_length]
            row = np.zeros(args.seq_length, np.int32)
            row[: len(toks)] = toks
            buf.append(row)
            if len(buf) == args.batch_size:
                yield np.stack(buf)
                buf = []
        if buf:  # pad the last batch to the jitted shape
            pad = np.zeros((args.batch_size - len(buf), args.seq_length),
                           np.int32)
            yield np.concatenate([np.stack(buf), pad])

    @jax.jit
    def encode(tokens):
        return encode_context(params, tokens, cfg, pad_mask=(tokens != 0),
                              compute_dtype=compute)

    path = embed_corpus(lambda b: encode(jnp.asarray(b)), batches(), args.out,
                        log_interval=20)
    emb = np.load(path)[: len(ds)]          # drop final-batch padding rows
    np.save(args.out + ".npy", emb)
    print(f"embedded {len(ds)} blocks -> {path} ({emb.shape})", flush=True)

    idx = MIPSIndex(emb)
    s, i = idx.search(emb[:2], k=3)
    print(f"self-retrieval smoke: top1 of block0 = {int(i[0, 0])}", flush=True)
    return {"num_embeddings": len(ds), "dim": emb.shape[1]}


if __name__ == "__main__":
    run(parse_args())
