#!/usr/bin/env python
"""Loader-only input-pipeline benchmark: host-side decoded images/sec.

Generates synthetic 224px JPEG tar shards (unless --train-data points at
real ones), then measures the wds pipeline's throughput for several worker
counts — the equivalent of timing open_CLIP's DataLoader without the model
(training/data.py get_wds_dataset + torch DataLoader num_workers).

Usage: python tools/bench_loader.py [--workers 1 2 4 8] [--batches 20]
"""
import argparse
import io
import os
import sys
import tarfile
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_shards(root, n_shards=8, per_shard=256, size=256):
    from PIL import Image
    rng = np.random.RandomState(0)
    for s in range(n_shards):
        p = os.path.join(root, f"bench-{s:05d}.tar")
        with tarfile.open(p, "w") as tf:
            for i in range(per_shard):
                img = Image.fromarray(
                    rng.randint(0, 255, (size, size, 3), np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG", quality=85)
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{s:05d}{i:05d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cap = f"a synthetic benchmark image {s} {i}".encode()
                info = tarfile.TarInfo(f"{s:05d}{i:05d}.txt")
                info.size = len(cap)
                tf.addfile(info, io.BytesIO(cap))
    return os.path.join(root, "bench-{00000..%05d}.tar" % (n_shards - 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-data", default=None)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=224)
    a = ap.parse_args()

    from megatron_clip_tpu.data.transforms import image_transform
    from megatron_clip_tpu.data.webdataset import WdsData
    from megatron_clip_tpu.tokenizer.clip_bpe import tokenize

    tmp = None
    spec = a.train_data
    if spec is None:
        tmp = tempfile.TemporaryDirectory()
        print("generating synthetic shards ...", flush=True)
        spec = make_shards(tmp.name)

    n = a.batch_size * a.batches
    for w in a.workers:
        ds = WdsData(spec, a.batch_size, image_transform(a.image_size, True),
                     tokenize, num_samples=n, seed=0, workers=w,
                     shuffle=True, shuffle_buffer=512)
        it = iter(ds)
        next(it)  # warm up worker start
        t0 = time.perf_counter()
        got = 1
        for _ in it:
            got += 1
        dt = time.perf_counter() - t0
        ips = (got - 1) * a.batch_size / dt
        print(f"workers={w}: {ips:8.1f} img/s host-side "
              f"({got} batches of {a.batch_size})", flush=True)


if __name__ == "__main__":
    main()
