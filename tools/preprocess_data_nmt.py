#!/usr/bin/env python
"""Plain-text (one sentence per line) -> MMap indexed dataset.

The reference's tools/preprocess_data_nmt.py: NMT finetuning corpora are
parallel text files with one sentence per line (no JSON wrapper, no EOD
token); each line becomes one sequence/document. Run once per language
side:

  python tools/preprocess_data_nmt.py --input train.de --output-prefix de \\
      --tokenizer gpt2-bpe --vocab-file vocab.json --merge-file merges.txt
"""
import argparse
import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from tools.preprocess_data import _init_worker
import tools.preprocess_data as _pd


def _encode_line(line):
    text = line.rstrip("\n")
    if not text:
        return None
    encode, _eod = _pd._worker_tok
    ids = encode(text)
    if len(ids) == 0:
        return None
    return np.asarray(ids, np.int32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="one sentence per line")
    p.add_argument("--output-prefix", required=True)
    p.add_argument("--tokenizer", default="gpt2-bpe")
    p.add_argument("--vocab-file", default=None)
    p.add_argument("--merge-file", default=None)
    p.add_argument("--tokenizer-model", default=None)
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--log-interval", type=int, default=100000)
    args = p.parse_args(argv)

    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
    builder = MMapIndexedDatasetBuilder(args.output_prefix, dtype=np.int32)

    tok_args = (args.tokenizer, args.vocab_file, args.merge_file,
                args.tokenizer_model)
    t0 = time.time()
    n = tokens = 0
    with open(args.input, encoding="utf-8") as f:
        if args.workers > 1:
            pool = mp.Pool(args.workers, initializer=_init_worker,
                           initargs=tok_args)
            it = pool.imap(_encode_line, f, chunksize=64)
        else:
            _init_worker(*tok_args)
            it = map(_encode_line, f)
        for ids in it:
            if ids is None:
                continue
            builder.add_item(ids)
            builder.end_document()
            n += 1
            tokens += len(ids)
            if n % args.log_interval == 0:
                print(f"{n} sentences ({n / (time.time() - t0):.0f}/s)",
                      flush=True)
    builder.finalize()
    print(f"done: {n} sentences, {tokens} tokens -> "
          f"{args.output_prefix}.bin/.idx", flush=True)


if __name__ == "__main__":
    main()
