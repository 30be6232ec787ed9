#!/usr/bin/env python
"""Build the RETRO retrieval database: chunk the corpus, embed chunks,
query k neighbors per chunk, store neighbor+continuation token arrays.

Reference: tools/retro/ (~2200 LoC: db build -> FAISS index -> query).
Here: chunks come from a GPT indexed dataset; embeddings from the
biencoder context tower (random-init by default — pass --load for a
trained encoder); search is the exact TPU MIPS index (indexer.py);
same-document neighbors are filtered like the reference's query stage.

Outputs:
  <out>_chunks.npy     [N, m] int32 chunk tokens
  <out>_chunk_docs.npy [N]    int64 source document ids
  <out>_neighbors.npy  [N, k, 2m] int32 neighbor + continuation tokens

  python tools/retro_build.py --data-path corpus --out /data/retro \
      --chunk-length 64 --num-neighbors 2
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser("retro db build")
    p.add_argument("--data-path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--chunk-length", type=int, default=64)
    p.add_argument("--num-neighbors", type=int, default=2)
    p.add_argument("--embed-dim", type=int, default=64)
    p.add_argument("--encoder-layers", type=int, default=2)
    p.add_argument("--encoder-width", type=int, default=128)
    p.add_argument("--vocab-size", type=int, default=50304)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--load", default=None, help="biencoder checkpoint root")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def build_chunks(ds, m):
    """Split each document into fixed-size chunks (tail padded with 0)."""
    chunks, docs = [], []
    for d in range(len(ds)):
        toks = np.asarray(ds[d], np.int64)
        for lo in range(0, len(toks), m):
            c = np.zeros(m, np.int32)
            seg = toks[lo:lo + m]
            c[: len(seg)] = seg
            chunks.append(c)
            docs.append(d)
    return np.stack(chunks), np.asarray(docs, np.int64)


def run(args):
    import jax
    import jax.numpy as jnp
    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDataset
    from megatron_clip_tpu.indexer import MIPSIndex
    from megatron_clip_tpu.models.bert import BertCfg
    from megatron_clip_tpu.models.biencoder import (
        BiencoderCfg, init_biencoder, encode_context)

    ds = MMapIndexedDataset(args.data_path)
    m = args.chunk_length
    chunks, chunk_docs = build_chunks(ds, m)
    n = len(chunks)
    print(f"{n} chunks of {m} tokens from {len(ds)} docs", flush=True)

    cfg = BiencoderCfg(
        bert=BertCfg(num_layers=args.encoder_layers,
                     hidden_size=args.encoder_width,
                     num_heads=max(1, args.encoder_width // 32),
                     vocab_size=args.vocab_size, seq_length=m,
                     add_binary_head=False),
        projection_dim=args.embed_dim)
    params = init_biencoder(jax.random.PRNGKey(args.seed), cfg)
    if args.load:
        from megatron_clip_tpu.checkpoints import load_checkpoint
        tree, _, _ = load_checkpoint(args.load, {"params": params})
        params = tree["params"]

    @jax.jit
    def encode(tokens):
        return encode_context(params, tokens, cfg, pad_mask=(tokens != 0),
                              compute_dtype=jnp.float32)

    embs = []
    for lo in range(0, n, args.batch_size):
        batch = chunks[lo:lo + args.batch_size]
        if len(batch) < args.batch_size:
            batch = np.concatenate(
                [batch, np.zeros((args.batch_size - len(batch), m),
                                 np.int32)])
        embs.append(np.asarray(encode(jnp.asarray(batch))))
    emb = np.concatenate(embs)[:n]

    index = MIPSIndex(emb)
    # over-query so same-doc filtering still leaves k neighbors
    kq = args.num_neighbors + 8
    _, nbr_idx = index.search(emb, k=min(kq, n))

    k = args.num_neighbors
    neighbors = np.zeros((n, k, 2 * m), np.int32)
    for i in range(n):
        got = 0
        for j in nbr_idx[i]:
            j = int(j)
            if chunk_docs[j] == chunk_docs[i]:
                continue          # reference filters same-document hits
            neighbors[i, got, :m] = chunks[j]
            if j + 1 < n and chunk_docs[j + 1] == chunk_docs[j]:
                neighbors[i, got, m:] = chunks[j + 1]   # continuation
            got += 1
            if got == k:
                break
    np.save(args.out + "_chunks.npy", chunks)
    np.save(args.out + "_chunk_docs.npy", chunk_docs)
    np.save(args.out + "_neighbors.npy", neighbors)
    print(f"wrote {args.out}_chunks/_chunk_docs/_neighbors "
          f"({n} x {k} x {2 * m})", flush=True)
    return {"num_chunks": n, "num_neighbors": k}


if __name__ == "__main__":
    run(parse_args())
