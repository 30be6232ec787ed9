#!/usr/bin/env python
"""Inspect / query a RETRO database built by tools/retro_build.py.

Reference: tools/retro/cli/ (cli.py `retro` class + __main__): load the
workdir args, then expose chunk counts, chunk/continuation text, stored
neighbors, and free-text queries against the index.

  python tools/retro_cli.py --db /data/retro stats
  python tools/retro_cli.py --db /data/retro chunk 17
  python tools/retro_cli.py --db /data/retro neighbors 17
  python tools/retro_cli.py --db /data/retro query "the eiffel tower"
  python tools/retro_cli.py --db /data/retro --interactive

Token ids decode through --tokenizer-type/--vocab-file/--merge-file (the
megatron tokenizer families) when given; otherwise ids print raw. `query`
embeds with the same biencoder config recorded in <db>_args.json
(+ its --load checkpoint), probes the IVF lists when centroids exist, and
falls back to exact MIPS otherwise — the same search retro_build's query
stage runs.
"""
import argparse
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shorten(s, n=120):
    s = "\\n".join(str(s).splitlines())
    return s if len(s) <= n else f"{s[:n // 2]} ... {s[-n // 2:]}"


class RetroDB:
    def __init__(self, db, tokenizer=None):
        self.db = db
        with open(db + "_args.json") as f:
            self.build_args = types.SimpleNamespace(**json.load(f))
        self.chunks = np.load(db + "_chunks.npy")
        self.chunk_docs = np.load(db + "_chunk_docs.npy")
        self.emb = np.load(db + "_emb.npy") \
            if os.path.exists(db + "_emb.npy") else None
        self.neighbors = np.load(db + "_neighbors.npy") \
            if os.path.exists(db + "_neighbors.npy") else None
        self.centroids = np.load(db + "_centroids.npy") \
            if os.path.exists(db + "_centroids.npy") else None
        self.assign = np.load(db + "_assign.npy") \
            if self.centroids is not None else None
        self.tokenizer = tokenizer
        self._encode = None

    # ---- inspection (cli.py get_db_* surface) ----
    def stats(self):
        n, m = self.chunks.shape
        out = {"num_chunks": n, "chunk_length": m,
               "num_docs": int(self.chunk_docs.max()) + 1 if n else 0,
               "embedded": self.emb is not None,
               "centroids": 0 if self.centroids is None
               else len(self.centroids)}
        if self.neighbors is not None:
            out["neighbors"] = list(self.neighbors.shape)
        return out

    def detok(self, ids):
        # strip TRAILING padding zeros only — id 0 can be a real vocab
        # token mid-chunk (gpt2-bpe id 0 = "!")
        ids = list(map(int, ids))
        while ids and ids[-1] == 0:
            ids.pop()
        if self.tokenizer is None:
            return " ".join(map(str, ids))
        return self.tokenizer.detokenize(ids)

    def chunk_text(self, idx):
        """Chunk + continuation (cli.py get_db_chunk_and_continuation_text:
        the next chunk when it belongs to the same document)."""
        n = len(self.chunks)
        cont = ""
        if idx + 1 < n and self.chunk_docs[idx + 1] == self.chunk_docs[idx]:
            cont = self.detok(self.chunks[idx + 1])
        return {"doc": int(self.chunk_docs[idx]),
                "text": self.detok(self.chunks[idx]),
                "continuation": cont}

    def neighbor_texts(self, idx):
        if self.neighbors is None:
            raise SystemExit("no _neighbors.npy — run retro_build --stage "
                             "query first")
        m = self.chunks.shape[1]
        out = []
        for row in self.neighbors[idx]:
            out.append({"text": self.detok(row[:m]),
                        "continuation": self.detok(row[m:])})
        return out

    # ---- free-text / token query ----
    def encoder(self):
        if self._encode is None:
            from tools.retro_build import _encoder
            self._encode = _encoder(self.build_args, self.chunks.shape[1])
        return self._encode

    def query(self, text_or_ids, k=4, nprobe=None):
        if self.emb is None:
            raise SystemExit("no _emb.npy — run retro_build --stage embed")
        m = self.chunks.shape[1]
        if isinstance(text_or_ids, str):
            if self.tokenizer is None:
                raise SystemExit("query text needs --tokenizer-type/"
                                 "--vocab-file (or pass token ids: "
                                 "'ids:1,2,3')")
            ids = self.tokenizer.tokenize(text_or_ids)
        else:
            ids = list(text_or_ids)
        toks = np.zeros((1, m), np.int32)
        toks[0, :min(m, len(ids))] = ids[:m]
        import jax.numpy as jnp
        q = np.asarray(self.encoder()(jnp.asarray(toks)))[0]
        if self.centroids is not None:
            nprobe = nprobe or getattr(self.build_args, "nprobe", 8)
            probe = np.argsort(-(self.centroids @ q))[:nprobe]
            cand = np.nonzero(np.isin(self.assign, probe))[0]
        else:
            cand = np.arange(len(self.emb))
        scores = self.emb[cand] @ q
        top = cand[np.argsort(-scores)[:k]]
        return [{"chunk": int(i), "score": float(self.emb[i] @ q),
                 **self.chunk_text(int(i))} for i in top]


def _build_tokenizer(a):
    if not a.tokenizer_type:
        return None
    from megatron_clip_tpu.tokenizer.megatron_tokenizers import \
        build_tokenizer
    return build_tokenizer(
        a.tokenizer_type, vocab_file=a.vocab_file, merge_file=a.merge_file,
        null_vocab_size=50304)


def _dispatch(db, cmd, rest):
    if cmd == "stats":
        print(json.dumps(db.stats()))
    elif cmd == "chunk":
        d = db.chunk_text(int(rest[0]))
        print(json.dumps({k: shorten(v) if isinstance(v, str) else v
                          for k, v in d.items()}))
    elif cmd == "neighbors":
        for j, d in enumerate(db.neighbor_texts(int(rest[0]))):
            print(f"[{j}] {shorten(d['text'])} || {shorten(d['continuation'])}")
    elif cmd == "query":
        arg = " ".join(rest)
        if arg.startswith("ids:"):
            arg = [int(x) for x in arg[4:].split(",") if x.strip()]
        for d in db.query(arg):
            print(f"chunk {d['chunk']} doc {d['doc']} "
                  f"score {d['score']:.3f}: {shorten(d['text'])}")
    else:
        raise SystemExit(f"unknown command {cmd!r} "
                         "(stats|chunk|neighbors|query)")


def main(argv=None):
    p = argparse.ArgumentParser("retro db CLI")
    p.add_argument("--db", required=True,
                   help="the --out prefix passed to retro_build.py")
    p.add_argument("--tokenizer-type", default=None,
                   help="GPT2BPETokenizer/BertWordPieceCase/... for "
                        "decoding + text queries")
    p.add_argument("--vocab-file", default=None)
    p.add_argument("--merge-file", default=None)
    p.add_argument("--interactive", action="store_true")
    p.add_argument("cmd", nargs="*", default=[])
    a = p.parse_args(argv)
    db = RetroDB(a.db, _build_tokenizer(a))
    if a.interactive:
        print(json.dumps(db.stats()))
        while True:
            try:
                line = input("retro> ").strip()
            except EOFError:
                break
            if not line or line in ("q", "quit", "exit"):
                break
            parts = line.split()
            try:
                _dispatch(db, parts[0], parts[1:])
            except SystemExit as e:
                print(e)
        return
    if not a.cmd:
        raise SystemExit("need a command: stats|chunk N|neighbors N|"
                         "query TEXT (or --interactive)")
    _dispatch(db, a.cmd[0], a.cmd[1:])


if __name__ == "__main__":
    main()
