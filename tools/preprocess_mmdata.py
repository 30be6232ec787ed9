#!/usr/bin/env python
"""Preprocess paired (image, caption) data into multimodal indexed datasets.

Reference: tools/preprocess_mmdata.py:171 — builds one indexed dataset of
tokenized captions and one of raw image bytes, consumed by
megatron_clip_tpu.data.multimodal_dataset.MultimodalDataset.

Input formats:
  --input captions.tsv          lines: <image_path>\t<caption>
  --input data.jsonl            lines: {"image": path, "caption": text}

Usage:
  python tools/preprocess_mmdata.py --input pairs.tsv \
      --output-prefix /data/cc3m --tokenizer clip
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iter_pairs(path):
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.lstrip().startswith("{"):
                j = json.loads(line)
                yield j["image"], j.get("caption") or j.get("text") or ""
            else:
                img, _, cap = line.partition("\t")
                yield img, cap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output-prefix", required=True)
    ap.add_argument("--tokenizer", default="clip",
                    help="tokenizer type for build_tokenizer")
    ap.add_argument("--vocab-file", default=None)
    ap.add_argument("--merge-file", default=None)
    ap.add_argument("--log-interval", type=int, default=1000)
    a = ap.parse_args()

    from megatron_clip_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder
    from megatron_clip_tpu.tokenizer.megatron_tokenizers import build_tokenizer

    tok = build_tokenizer(a.tokenizer, vocab_file=a.vocab_file,
                          merge_file=a.merge_file)
    tb = MMapIndexedDatasetBuilder(a.output_prefix + "_text", dtype=np.int32)
    ib = MMapIndexedDatasetBuilder(a.output_prefix + "_img", dtype=np.uint8)
    n = skipped = 0
    for img_path, caption in iter_pairs(a.input):
        try:
            with open(img_path, "rb") as f:
                raw = f.read()
        except OSError:
            skipped += 1
            continue
        if hasattr(tok, "sot_token_id"):   # CLIP SimpleTokenizer
            ids = [tok.sot_token_id] + tok.encode(caption) + [tok.eot_token_id]
        else:
            ids = tok.tokenize(caption)
        tb.add_item(np.asarray(ids, np.int32))
        tb.end_document()
        ib.add_item(np.frombuffer(raw, np.uint8))
        ib.end_document()
        n += 1
        if n % a.log_interval == 0:
            print(f"processed {n} pairs ({skipped} skipped)", flush=True)
    tb.finalize()
    ib.finalize()
    print(f"wrote {n} pairs to {a.output_prefix}_text/_img "
          f"({skipped} skipped)", flush=True)


if __name__ == "__main__":
    main()
