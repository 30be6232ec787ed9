#!/usr/bin/env python
"""Build the RETRO retrieval database — staged, corpus-scale.

Reference: tools/retro/ (~2200 LoC): db build -> FAISS IVF index train/add
-> neighbor query, run as separate resumable jobs over on-disk
intermediates. Same structure here, TPU-native:

  --stage chunks  corpus -> <out>_chunks.npy [N, m] + <out>_chunk_docs.npy
  --stage embed   chunks -> <out>_emb/shard_XXXX.npy (batched encoder
                  forwards on the chip; resumable — existing shards are
                  skipped), then consolidated <out>_emb.npy
  --stage index   k-means coarse quantizer (the IVF analogue of the
                  reference's faiss.index_factory "IVF*,Flat"):
                  <out>_centroids.npy + <out>_assign.npy; clustering runs
                  as jitted Lloyd iterations on the device
  --stage query   per chunk: probe the nearest --nprobe centroids, exact
                  MIPS within their inverted lists (indexer.py kernel),
                  filter same-document hits, attach continuations ->
                  <out>_neighbors.npy [N, k, 2m]
  --stage all     everything in sequence (default; small-corpus one-shot)

Embeddings come from the biencoder context tower (random-init by default —
pass --load for a trained encoder, tools/bert_embedding.py to train one).

  python tools/retro_build.py --data-path corpus --out /data/retro \
      --chunk-length 64 --num-neighbors 2 --num-centroids 1024
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
    p.add_argument("--stage", choices=["chunks", "embed", "index", "query",
                                       "recall", "all"], default="all")
    p.add_argument("--chunk-length", type=int, default=64)
    p.add_argument("--num-neighbors", type=int, default=2)
    p.add_argument("--embed-dim", type=int, default=64)
    p.add_argument("--encoder-layers", type=int, default=2)
    p.add_argument("--encoder-width", type=int, default=128)
    p.add_argument("--vocab-size", type=int, default=50304)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--embed-shard-size", type=int, default=65536,
                   help="chunks per embedding shard file (resume unit)")
    p.add_argument("--num-centroids", type=int, default=0,
                   help="IVF coarse centroids; 0 = exact MIPS over the "
                        "full db (small corpora)")
    p.add_argument("--nprobe", type=int, default=64,
                   help="IVF lists probed per query. Default measured at "
                        "100k chunks / 1024 centroids: recall@2 vs exact "
                        "MIPS = 0.83 @8, 0.90 @16, 0.95 @32, 0.98 @64 "
                        "(still ~10x exact-search qps); see README")
    p.add_argument("--measure-recall", type=int, default=0, metavar="N",
                   help="with --stage recall (or after query): sample N "
                        "query chunks, compare the probed IVF top-k "
                        "against exact MIPS and print recall@k (the "
                        "reference validates its FAISS IVF config the "
                        "same way)")
    p.add_argument("--kmeans-iters", type=int, default=10)
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


def _encoder(args, m):
    import jax
    import jax.numpy as jnp
    from megatron_clip_tpu.models.bert import BertCfg
    from megatron_clip_tpu.models.biencoder import (
        BiencoderCfg, init_biencoder, encode_context)

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

    return encode


def stage_chunks(args):
    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDataset
    ds = MMapIndexedDataset(args.data_path)
    chunks, chunk_docs = build_chunks(ds, args.chunk_length)
    np.save(args.out + "_chunks.npy", chunks)
    np.save(args.out + "_chunk_docs.npy", chunk_docs)
    print(f"[chunks] {len(chunks)} chunks of {args.chunk_length} tokens "
          f"from {len(ds)} docs", flush=True)
    return chunks, chunk_docs


def stage_embed(args):
    import jax.numpy as jnp
    chunks = np.load(args.out + "_chunks.npy")
    n, m = chunks.shape
    encode = _encoder(args, m)
    shard_dir = args.out + "_emb"
    os.makedirs(shard_dir, exist_ok=True)
    bs, ss = args.batch_size, args.embed_shard_size
    n_shards = -(-n // ss)
    for si in range(n_shards):
        path = os.path.join(shard_dir, f"shard_{si:04d}.npy")
        if os.path.exists(path):
            continue            # resumable: skip completed shards
        lo_s, hi_s = si * ss, min((si + 1) * ss, n)
        embs = []
        for lo in range(lo_s, hi_s, bs):
            batch = chunks[lo:lo + bs]
            if len(batch) < bs:
                batch = np.concatenate(
                    [batch, np.zeros((bs - len(batch), m), np.int32)])
            embs.append(np.asarray(encode(jnp.asarray(batch))))
        np.save(path, np.concatenate(embs)[: hi_s - lo_s])
        print(f"[embed] shard {si + 1}/{n_shards}", flush=True)
    emb = np.concatenate([
        np.load(os.path.join(shard_dir, f"shard_{si:04d}.npy"))
        for si in range(n_shards)])
    np.save(args.out + "_emb.npy", emb)
    print(f"[embed] {emb.shape} consolidated", flush=True)
    return emb


def stage_index(args):
    """K-means coarse quantizer (Lloyd iterations, jitted)."""
    import jax
    import jax.numpy as jnp
    emb = np.load(args.out + "_emb.npy")
    n, d = emb.shape
    c = min(args.num_centroids or 0, n)
    if c <= 1:
        print("[index] exact-MIPS mode (no centroids)", flush=True)
        return None, None
    rng = np.random.RandomState(args.seed)
    centroids = emb[rng.choice(n, c, replace=False)].copy()

    @jax.jit
    def assign(e, cen):
        # max inner product (embeddings are what the MIPS index searches)
        return jnp.argmax(e @ cen.T, axis=1)

    e = jnp.asarray(emb)
    for it in range(args.kmeans_iters):
        a = np.asarray(assign(e, jnp.asarray(centroids)))
        sums = np.zeros((c, d), np.float64)
        np.add.at(sums, a, emb)
        counts = np.bincount(a, minlength=c)[:, None].clip(min=1)
        centroids = (sums / counts).astype(np.float32)
    a = np.asarray(assign(e, jnp.asarray(centroids)))
    np.save(args.out + "_centroids.npy", centroids)
    np.save(args.out + "_assign.npy", a)
    print(f"[index] {c} centroids, {args.kmeans_iters} iters", flush=True)
    return centroids, a


def _load_ivf(args):
    """(centroids, inverted lists) or (None, None) in exact mode."""
    cen_path = args.out + "_centroids.npy"
    if not (os.path.exists(cen_path) and args.num_centroids):
        return None, None
    centroids = np.load(cen_path)
    assign = np.load(args.out + "_assign.npy")
    lists = [np.nonzero(assign == ci)[0] for ci in range(len(centroids))]
    return centroids, lists


def _ivf_topk(emb, queries, centroids, lists, kq, nprobe):
    """Probed IVF max-inner-product top-kq ids for each query row.

    queries: [Q, d] (rows of emb or arbitrary vectors). Probes the nprobe
    nearest centroids and searches their inverted lists exactly — the
    IVF*,Flat behavior of the reference's FAISS index
    (tools/retro/index/indexes/faiss_base.py).

    Device-batched: the inverted lists are padded to a fixed [C, Lmax]
    matrix so each query block's candidate scoring is one gather + one
    batched matvec on the accelerator (at 100k chunks this takes the
    query stage from ~8 min of host loops to seconds); a numpy fallback
    covers tiny corpora and hosts without a usable device."""
    q = np.asarray(queries, np.float32)
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    try:
        return _ivf_topk_device(emb, q, probe, lists, kq)
    except Exception:  # noqa: BLE001 — fall back to the host loop
        import traceback
        traceback.print_exc()
        out = np.zeros((len(q), kq), np.int64)
        for i in range(len(q)):
            cand = np.concatenate([lists[ci] for ci in probe[i]])
            scores = emb[cand] @ q[i]
            top = cand[np.argsort(-scores)[:kq]]
            out[i, : len(top)] = top
            if len(top) < kq:
                out[i, len(top):] = top[-1] if len(top) else i
        return out


def _ivf_topk_device(emb, q, probe, lists, kq):
    """Fixed-shape candidate scoring on the device: pad the inverted lists
    to [C, Lmax] (pad id = 0, masked to -inf), gather each query's probed
    lists, one batched matvec, lax.top_k."""
    import jax
    import jax.numpy as jnp

    lmax = max(1, max(len(l) for l in lists))
    c = len(lists)
    lm = np.zeros((c, lmax), np.int32)
    mask = np.zeros((c, lmax), bool)
    for ci, l in enumerate(lists):
        lm[ci, : len(l)] = l
        mask[ci, : len(l)] = True
    e = jnp.asarray(emb, jnp.float32)
    lm_d, mask_d = jnp.asarray(lm), jnp.asarray(mask)

    @jax.jit
    def block(qb, pb):
        cand = lm_d[pb]                       # [Q, nprobe, Lmax]
        cm = mask_d[pb]
        qq = cand.reshape(qb.shape[0], -1)    # [Q, P*Lmax]
        sc = jnp.einsum("qcd,qd->qc", e[qq], qb)
        sc = jnp.where(cm.reshape(qb.shape[0], -1), sc, -jnp.inf)
        k = min(kq, qq.shape[1])
        top_sc, top_ix = jax.lax.top_k(sc, k)
        ids = jnp.take_along_axis(qq, top_ix, axis=1)
        return ids, top_sc

    out = np.zeros((len(q), kq), np.int64)
    bs = max(1, min(len(q), int(2 ** 28 // max(1, probe.shape[1] * lmax
                                               * emb.shape[1]))))
    for lo in range(0, len(q), bs):
        ids, sc = block(jnp.asarray(q[lo:lo + bs]),
                        jnp.asarray(probe[lo:lo + bs]))
        ids, sc = np.asarray(ids), np.asarray(sc)
        n_in = ids.shape[1]
        out[lo:lo + bs, :n_in] = ids
        if n_in < kq:
            out[lo:lo + bs, n_in:] = ids[:, -1:]
        # -inf rows (fewer live candidates than kq): repeat the best id
        dead = ~np.isfinite(sc)
        if dead.any():
            rows, cols = np.nonzero(dead)
            out[lo + rows, cols] = out[lo + rows, 0]
    return out


def stage_recall(args):
    """Measure probed-IVF recall@k against exact MIPS on sampled queries.

    The reference validates its FAISS IVF configs the same way (query the
    index, compare with brute force). Prints one JSON line with
    recall@k / recall@kq and the sampled query count."""
    import json
    import time
    emb = np.load(args.out + "_emb.npy")
    n = len(emb)
    centroids, lists = _load_ivf(args)
    if centroids is None:
        print("[recall] exact-MIPS mode: recall is 1.0 by construction",
              flush=True)
        return {"recall_at_k": 1.0}
    k = args.num_neighbors
    kq = k + 8
    nq = min(args.measure_recall or 1024, n)
    rng = np.random.RandomState(args.seed + 1)
    qidx = rng.choice(n, nq, replace=False)

    from megatron_clip_tpu.indexer import MIPSIndex
    index = MIPSIndex(emb)
    t0 = time.time()
    _, exact = index.search(emb[qidx], k=min(kq, n))
    t_exact = time.time() - t0
    t0 = time.time()
    probed = _ivf_topk(emb, emb[qidx], centroids, lists, kq, args.nprobe)
    t_ivf = time.time() - t0

    def recall(at):
        hits = 0
        for r in range(nq):
            hits += len(set(exact[r, :at].tolist())
                        & set(probed[r, :at].tolist()))
        return hits / (nq * at)

    res = {"num_chunks": int(n), "num_queries": int(nq),
           "num_centroids": int(len(centroids)), "nprobe": int(args.nprobe),
           "recall_at_k": round(recall(k), 4),
           "recall_at_kq": round(recall(kq), 4),
           "exact_qps": round(nq / max(t_exact, 1e-9), 1),
           "ivf_qps": round(nq / max(t_ivf, 1e-9), 1)}
    print("[recall] " + json.dumps(res), flush=True)
    return res


def stage_query(args):
    from megatron_clip_tpu.indexer import MIPSIndex
    chunks = np.load(args.out + "_chunks.npy")
    chunk_docs = np.load(args.out + "_chunk_docs.npy")
    emb = np.load(args.out + "_emb.npy")
    n, m = chunks.shape
    k = args.num_neighbors
    kq = k + 8                  # over-query so doc filtering leaves k

    centroids, lists = _load_ivf(args)
    if centroids is not None:
        nbr_idx = _ivf_topk(emb, emb, centroids, lists, kq, args.nprobe)
    else:
        index = MIPSIndex(emb)
        _, nbr_idx = index.search(emb, k=min(kq, n))

    neighbors = np.zeros((n, k, 2 * m), np.int32)
    for i in range(n):
        got = 0
        seen = set()
        for j in nbr_idx[i]:
            j = int(j)
            # skip same-document hits (reference filter) and duplicates —
            # the probed IVF path pads short candidate lists by repeating
            # an id, which must not occupy several of the k slots
            if chunk_docs[j] == chunk_docs[i] or j in seen:
                continue
            seen.add(j)
            neighbors[i, got, :m] = chunks[j]
            if j + 1 < n and chunk_docs[j + 1] == chunk_docs[j]:
                neighbors[i, got, m:] = chunks[j + 1]   # continuation
            got += 1
            if got == k:
                break
    np.save(args.out + "_neighbors.npy", neighbors)
    print(f"[query] wrote {args.out}_neighbors ({n} x {k} x {2 * m})",
          flush=True)
    return {"num_chunks": n, "num_neighbors": k}


def run(args):
    res = {"num_chunks": 0, "num_neighbors": args.num_neighbors}
    # persist the build args next to the artifacts so tools/retro_cli.py can
    # rebuild the encoder and know the layout (the reference stores args.json
    # in the retro workdir, tools/retro/utils.get_args_path). Only the stages
    # that (re)create chunks/embeddings may write it — a later
    # `--stage query` run with default flags must not clobber the encoder
    # config the embeddings were actually built with.
    if args.stage in ("all", "chunks", "embed") \
            or not os.path.exists(args.out + "_args.json"):
        import json
        with open(args.out + "_args.json", "w") as f:
            json.dump(vars(args), f, indent=1)
    if args.stage in ("chunks", "all"):
        stage_chunks(args)
    if args.stage in ("embed", "all"):
        stage_embed(args)
    if args.stage in ("index", "all"):
        stage_index(args)
    if args.stage in ("query", "all"):
        res = stage_query(args)
    if args.stage == "recall" or (args.stage == "all"
                                  and args.measure_recall):
        res = dict(res, **stage_recall(args))
    return res


if __name__ == "__main__":
    run(parse_args())
