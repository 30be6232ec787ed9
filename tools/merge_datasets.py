#!/usr/bin/env python
"""Merge a directory of MMap indexed datasets into one .bin/.idx pair.

The reference's tools/merge_datasets.py: scan --input for matching
<prefix>.bin/<prefix>.idx pairs, concatenate them (sequences, document
boundaries and dtype preserved) into --output-prefix in sorted-prefix
order. Useful after sharded/multi-node preprocess_data runs.

  python tools/merge_datasets.py --input shards/ --output-prefix corpus
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="directory containing the .bin/.idx pairs to merge")
    p.add_argument("--output-prefix", required=True,
                   help="output path without the .bin/.idx suffix")
    args = p.parse_args(argv)

    from megatron_clip_tpu.data.indexed_dataset import (
        MMapIndexedDataset, MMapIndexedDatasetBuilder)

    if not os.path.isdir(args.input):
        raise SystemExit(f"--input {args.input!r} is not a directory")
    out_dir = os.path.dirname(os.path.abspath(args.output_prefix))
    if not os.path.isdir(out_dir):
        raise SystemExit(f"output directory {out_dir!r} does not exist")

    prefixes = set()
    for name in sorted(os.listdir(args.input)):
        stem, ext = os.path.splitext(name)
        if ext not in (".bin", ".idx") or stem in prefixes:
            continue
        pair = ".idx" if ext == ".bin" else ".bin"
        if not os.path.isfile(os.path.join(args.input, stem + pair)):
            raise SystemExit(
                f"{stem + pair} missing for {os.path.join(args.input, name)}")
        prefixes.add(stem)
    if not prefixes:
        raise SystemExit(f"no .bin/.idx pairs found in {args.input!r}")

    builder = None
    n_seq = 0
    for stem in sorted(prefixes):
        src = os.path.join(args.input, stem)
        if builder is None:
            dtype = MMapIndexedDataset(src).dtype
            builder = MMapIndexedDatasetBuilder(args.output_prefix,
                                                dtype=dtype)
        builder.merge_file(src)
        n_seq = len(builder.sizes)
        print(f"merged {stem} -> {n_seq} sequences total", flush=True)
    builder.finalize()
    print(f"done: {len(prefixes)} datasets, {n_seq} sequences, "
          f"{len(builder.doc_idx) - 1} documents -> "
          f"{args.output_prefix}.bin/.idx", flush=True)


if __name__ == "__main__":
    main()
