#!/usr/bin/env python
"""Loader-only input-pipeline benchmark: host-side decoded images/sec.

Generates synthetic JPEG tar shards (unless --train-data points at real
ones), then measures the wds pipeline's throughput for several worker
counts — the equivalent of timing open_CLIP's DataLoader without the model
(training/data.py get_wds_dataset + torch DataLoader num_workers) — and
prints the roofline summary: img/s per decode worker and the workers needed
to feed a training chip (README "Input pipeline" table).

Synthetic images are low-frequency (photo-like compressibility): random
noise JPEGs are entropy-decode-bound and understate real throughput ~2x.

Usage: python tools/bench_loader.py [--workers 1 2 4 8] [--batches 20]
       [--src-size 512] [--chip-img-s 2269] [--no-draft]
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


def make_shards(root, n_shards=8, per_shard=256, size=512):
    from PIL import Image, ImageFilter
    rng = np.random.RandomState(0)
    for s in range(n_shards):
        p = os.path.join(root, f"bench-{s:05d}.tar")
        with tarfile.open(p, "w") as tf:
            for i in range(per_shard):
                # photo-like: low-frequency content upsampled + blurred
                base = rng.randint(0, 255, (size // 16, size // 16, 3),
                                   np.uint8)
                img = Image.fromarray(base).resize((size, size),
                                                   Image.BICUBIC)
                img = img.filter(ImageFilter.GaussianBlur(1))
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


def measure(spec, workers, batch_size, batches, image_size):
    from megatron_clip_tpu.data.transforms import image_transform
    from megatron_clip_tpu.data.webdataset import WdsData
    from megatron_clip_tpu.tokenizer.clip_bpe import tokenize

    n = batch_size * batches
    ds = WdsData(spec, batch_size, image_transform(image_size, True),
                 tokenize, num_samples=n, seed=0, workers=workers,
                 shuffle=True, shuffle_buffer=512)
    it = iter(ds)
    next(it)  # warm up worker start
    t0 = time.perf_counter()
    got = 1
    for _ in it:
        got += 1
    dt = time.perf_counter() - t0
    return (got - 1) * batch_size / dt, got


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-data", default=None)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--src-size", type=int, default=512,
                    help="synthetic source JPEG resolution (LAION median-ish)")
    ap.add_argument("--chip-img-s", type=float, default=2269.0,
                    help="consumer rate to size workers against "
                         "(ViT-B/32 v5e: 2269 img/s/chip, BENCH_r04)")
    ap.add_argument("--no-draft", action="store_true",
                    help="disable JPEG draft decode (MCT_JPEG_DRAFT=0)")
    a = ap.parse_args()

    if a.no_draft:
        os.environ["MCT_JPEG_DRAFT"] = "0"

    tmp = None
    spec = a.train_data
    if spec is None:
        tmp = tempfile.TemporaryDirectory()
        print(f"generating synthetic {a.src_size}px shards ...", flush=True)
        spec = make_shards(tmp.name, size=a.src_size)

    best_per_worker = 0.0
    for w in a.workers:
        ips, got = measure(spec, w, a.batch_size, a.batches, a.image_size)
        print(f"workers={w}: {ips:8.1f} img/s host-side "
              f"({got} batches of {a.batch_size})", flush=True)
        best_per_worker = max(best_per_worker, ips / w if w else ips)

    need_chip = a.chip_img_s / best_per_worker if best_per_worker else 0
    print(f"\nroofline: {best_per_worker:.0f} img/s per decode worker "
          f"(draft={'off' if a.no_draft else 'on'}, "
          f"{a.src_size}px sources -> {a.image_size}px)")
    print(f"  feed {a.chip_img_s:.0f} img/s/chip : {need_chip:.1f} workers")
    print(f"  feed a 4-chip v5e host             : {4 * need_chip:.1f} "
          f"workers (host has 112 vCPUs)")


if __name__ == "__main__":
    main()
