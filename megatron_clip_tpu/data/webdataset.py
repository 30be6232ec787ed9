"""WebDataset-style tar-shard streaming loader (no external deps).

Re-implements the behaviors of open_CLIP's wds pipeline
(open_CLIP/src/training/data.py:327-431) that matter for training:
  - brace-expanded shard url lists ("{00000..00099}.tar", "{a,b}.tar");
  - deterministic epoch-seeded shard shuffle (detshuffle2, data.py:242-273);
  - sample grouping by key inside each tar (basename before first dot),
    image decode (jpg/png/webp via PIL) + caption (txt/json);
  - sample shuffle buffer (_SAMPLE_SHUFFLE_SIZE analogue);
  - `with_epoch`-style num_batches/num_samples bookkeeping for resume;
  - background thread prefetch (the "workers" of the torch DataLoader).
"""
import io
import json
import os
import queue
import random
import re
import tarfile
import threading
from typing import Callable, Iterator, List, Optional

import numpy as np

_IMG_EXTS = ("jpg", "jpeg", "png", "webp", "ppm", "pgm", "bmp")
_TXT_EXTS = ("txt", "text", "caption")
SHUFFLE_BUFFER = 2000


def brace_expand(spec: str) -> List[str]:
    """Expand {000..099} ranges (zero-padded) and {a,b,c} alternatives."""
    m = re.search(r"\{(\d+)\.\.(\d+)\}", spec)
    if m:
        lo, hi = m.group(1), m.group(2)
        width = len(lo)
        out = []
        for i in range(int(lo), int(hi) + 1):
            out.extend(brace_expand(spec[:m.start()] + str(i).zfill(width)
                                    + spec[m.end():]))
        return out
    m = re.search(r"\{([^{}]*,[^{}]*)\}", spec)
    if m:
        out = []
        for alt in m.group(1).split(","):
            out.extend(brace_expand(spec[:m.start()] + alt + spec[m.end():]))
        return out
    return [spec]


def expand_urls(urls) -> List[str]:
    """'::'-separated multi-source spec, each brace-expanded (data.py:36-55)."""
    if isinstance(urls, str):
        urls = urls.split("::")
    out = []
    for u in urls:
        out.extend(brace_expand(u))
    return out


def iterate_tar_samples(path: str) -> Iterator[dict]:
    """Group tar members into samples keyed by basename-before-first-dot."""
    with tarfile.open(path, mode="r|*") as tf:
        current_key, sample = None, {}
        for member in tf:
            if not member.isfile():
                continue
            name = os.path.basename(member.name)
            if "." not in name:
                continue
            key, ext = name.split(".", 1)
            ext = ext.lower()
            if key != current_key:
                if sample:
                    yield sample
                current_key, sample = key, {"__key__": key}
            fobj = tf.extractfile(member)
            if fobj is not None:
                sample[ext] = fobj.read()
        if sample:
            yield sample


def decode_sample(sample: dict):
    """-> (PIL image, caption str) or None if incomplete."""
    from PIL import Image
    img_bytes = txt = None
    for ext, val in sample.items():
        if ext.startswith("__"):
            continue
        if ext in _IMG_EXTS:
            img_bytes = val
        elif ext in _TXT_EXTS:
            txt = val.decode("utf-8", errors="replace")
        elif ext == "json":
            try:
                j = json.loads(val)
                txt = j.get("caption") or j.get("text") or txt
            except Exception:
                pass
    if img_bytes is None or txt is None:
        return None
    try:
        img = Image.open(io.BytesIO(img_bytes))
        img.load()
    except Exception:
        return None
    return img, txt


class WdsData:
    """Shard-streaming (image, caption) batch iterator."""

    def __init__(self, urls, batch_size: int, preprocess: Callable,
                 tokenizer: Callable, *, num_samples: Optional[int] = None,
                 seed: int = 0, context_length: int = 77, workers: int = 2,
                 shuffle: bool = True, shuffle_buffer: int = SHUFFLE_BUFFER,
                 resampled: bool = False):
        self.shards = expand_urls(urls)
        if not self.shards:
            raise ValueError(f"no shards from {urls!r}")
        if num_samples is None:
            # open_CLIP requires --train-num-samples when metadata is absent
            # (data.py:344-352); estimate by counting one shard.
            probe = sum(1 for _ in iterate_tar_samples(self.shards[0]))
            num_samples = probe * len(self.shards)
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.num_batches = max(1, num_samples // batch_size)
        self.preprocess = preprocess
        self.tokenizer = tokenizer
        self.context_length = context_length
        self.seed = seed
        self.epoch = 0
        self.shuffle = shuffle
        self.shuffle_buffer = shuffle_buffer
        self.workers = max(1, workers)
        self.resampled = resampled

    def _sample_stream(self, shards: List[str], rng: random.Random):
        buf = []
        for shard in shards:
            for raw in iterate_tar_samples(shard):
                decoded = decode_sample(raw)
                if decoded is None:
                    continue
                if self.shuffle:
                    buf.append(decoded)
                    if len(buf) >= self.shuffle_buffer:
                        i = rng.randrange(len(buf))
                        buf[i], item = buf[-1], buf[i]
                        buf.pop()
                        yield item
                else:
                    yield decoded
        if self.shuffle:
            rng.shuffle(buf)
        yield from buf

    def __iter__(self):
        rng = random.Random(self.seed + self.epoch)
        if self.resampled:
            # ResampledShards2 semantics (data.py:274-326): shards drawn WITH
            # replacement each epoch — statistically balanced across workers
            shards = [rng.choice(self.shards) for _ in self.shards]
        else:
            # detshuffle2 semantics: shard order = f(seed, epoch), same on
            # every host (data.py:242-273)
            shards = list(self.shards)
            if self.shuffle:
                rng.shuffle(shards)
        self.epoch += 1

        q: "queue.Queue" = queue.Queue(maxsize=8)
        stop = object()

        def producer():
            imgs, caps = [], []
            try:
                for img, cap in self._sample_stream(shards, rng):
                    imgs.append(self.preprocess(img))
                    caps.append(cap)
                    if len(imgs) == self.batch_size:
                        q.put((np.stack(imgs),
                               np.asarray(self.tokenizer(caps, self.context_length),
                                          np.int32)))
                        imgs, caps = [], []
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        produced = 0
        while produced < self.num_batches:
            item = q.get()
            if item is stop:
                break
            produced += 1
            yield item
