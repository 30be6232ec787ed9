#!/usr/bin/env python
"""JSONL corpus -> MMap indexed dataset (.bin/.idx).

The reference's tools/preprocess_data.py (json -> tokens -> MMapIndexedDataset,
multiprocess) for the TPU stack. One document per line:
  {"text": "..."}  (key configurable via --json-key)

Example:
  python tools/preprocess_data.py --input corpus.jsonl --output-prefix out \\
      --tokenizer clip-bpe --append-eod
"""
import argparse
import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def make_tokenizer(kind: str, vocab_file=None, merge_file=None,
                   tokenizer_model=None):
    """-> (encode(text) -> ids, eod_id).

    kinds: clip-bpe | hf:<name> | any megatron tokenizer type accepted by
    tokenizer/megatron_tokenizers.py build_tokenizer (GPT2BPETokenizer,
    BertWordPieceLowerCase/Case, SentencePieceTokenizer, NullTokenizer —
    reference tools/preprocess_data.py --tokenizer-type choices).
    """
    if kind == "clip-bpe":
        from megatron_clip_tpu.tokenizer import SimpleTokenizer
        tok = SimpleTokenizer()
        return tok.encode, tok.eot_token_id
    if kind.startswith("hf:"):
        from transformers import AutoTokenizer
        t = AutoTokenizer.from_pretrained(kind[3:])
        return (lambda s: t(s, add_special_tokens=False)["input_ids"],
                t.eos_token_id or 0)
    from megatron_clip_tpu.tokenizer.megatron_tokenizers import build_tokenizer
    try:
        tok = build_tokenizer(kind, vocab_file=vocab_file,
                              merge_file=merge_file,
                              tokenizer_model=tokenizer_model)
    except ValueError:
        raise ValueError(f"unknown tokenizer {kind!r} "
                         "(clip-bpe | hf:<name> | megatron tokenizer type)")
    eod = tok.eod if hasattr(tok, "eod") else tok.sep
    return tok.tokenize, eod


_worker_tok = None


def _init_worker(kind, vocab_file=None, merge_file=None,
                 tokenizer_model=None):
    global _worker_tok
    _worker_tok = make_tokenizer(kind, vocab_file, merge_file,
                                 tokenizer_model)


def _encode(line):
    encode, eod = _worker_tok
    try:
        doc = json.loads(line)
    except json.JSONDecodeError:
        return None
    text = doc.get(_encode.json_key, "")
    if not text:
        return None
    ids = encode(text)
    if _encode.append_eod:
        ids = list(ids) + [eod]
    return np.asarray(ids, np.int32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="jsonl file")
    p.add_argument("--output-prefix", required=True)
    p.add_argument("--json-key", default="text")
    p.add_argument("--tokenizer", default="clip-bpe")
    p.add_argument("--vocab-file", default=None)
    p.add_argument("--merge-file", default=None)
    p.add_argument("--tokenizer-model", default=None)
    p.add_argument("--append-eod", action="store_true")
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--log-interval", type=int, default=10000)
    args = p.parse_args(argv)

    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
    builder = MMapIndexedDatasetBuilder(args.output_prefix, dtype=np.int32)

    _encode.json_key = args.json_key
    _encode.append_eod = args.append_eod

    t0 = time.time()
    n = tokens = 0
    with open(args.input) as f:
        tok_args = (args.tokenizer, args.vocab_file, args.merge_file,
                    args.tokenizer_model)
        if args.workers > 1:
            pool = mp.Pool(args.workers, initializer=_init_worker,
                           initargs=tok_args)
            it = pool.imap(_encode, f, chunksize=32)
        else:
            _init_worker(*tok_args)
            it = map(_encode, f)
        for ids in it:
            if ids is None or len(ids) == 0:
                continue
            builder.add_item(ids)
            builder.end_document()
            n += 1
            tokens += len(ids)
            if n % args.log_interval == 0:
                rate = n / (time.time() - t0)
                print(f"{n} docs, {tokens} tokens ({rate:.0f} docs/s)",
                      flush=True)
    builder.finalize()
    print(f"done: {n} docs, {tokens} tokens -> "
          f"{args.output_prefix}.bin/.idx", flush=True)


if __name__ == "__main__":
    main()
