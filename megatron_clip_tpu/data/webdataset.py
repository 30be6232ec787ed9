"""WebDataset-style tar-shard streaming loader (no external deps).

Re-implements the behaviors of open_CLIP's wds pipeline
(open_CLIP/src/training/data.py:327-431) that matter for training:
  - brace-expanded shard url lists ("{00000..00099}.tar", "{a,b}.tar");
  - deterministic epoch-seeded shard shuffle (detshuffle2, data.py:242-273);
  - per-host and per-worker shard splitting (split_by_node/split_by_worker);
  - sample grouping by key inside each tar (basename before first dot),
    image decode (jpg/png/webp via PIL) + caption (txt/json);
  - sample shuffle buffer (_SAMPLE_SHUFFLE_SIZE analogue);
  - `with_epoch`-style num_batches/num_samples bookkeeping for resume;
  - a multi-process decode pool (the torch DataLoader `num_workers`
    equivalent): each worker owns a shard slice and ships ready batches
    over an mp queue; `device_prefetch` overlaps host->device transfer.
"""
import io
import json
import multiprocessing as mp
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


def expand_urls_with_weights(urls, weights):
    """Per-source sample weights for '::'-separated specs (open_CLIP
    --train-data-upsampling-factors, data.py expand_urls): each source's
    weight is repeated over its brace-expanded shards."""
    if isinstance(urls, str):
        urls = urls.split("::")
    if isinstance(weights, str):
        weights = [float(w) for w in weights.split("::")]
    if len(weights) != len(urls):
        raise ValueError(f"{len(weights)} upsampling factors for "
                         f"{len(urls)} '::'-separated sources")
    shards, shard_weights = [], []
    for u, w in zip(urls, weights):
        ex = brace_expand(u)
        shards.extend(ex)
        shard_weights.extend([float(w)] * len(ex))
    return shards, shard_weights


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


def decode_sample(sample: dict, draft_size: int = None):
    """-> (PIL image, caption str) or None if incomplete.

    `draft_size`: JPEG DCT-domain downscale-on-decode (PIL draft mode).
    libjpeg picks the largest 1/1..1/8 scale whose result still covers
    draft_size, so the decoded image is always >= the training resolution —
    the RandomResizedCrop then works on relative geometry. Measured 2.2x
    (512px sources) to 4.6x (1024px) fewer decode ms/img at 224px targets
    (tools/bench_loader.py table in README); the standard DALI/FFCV decode
    trick, disable with MCT_JPEG_DRAFT=0."""
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
        if draft_size and img.format == "JPEG":
            img.draft("RGB", (draft_size, draft_size))
        img.load()
    except Exception:
        return None
    return img, txt


def split_by_node(shards: List[str], rank: int, world_size: int) -> List[str]:
    """Per-host shard slice (open_CLIP data.py split_by_node semantics:
    node r takes shards[r::world_size])."""
    if world_size <= 1:
        return list(shards)
    return list(shards[rank::world_size])


def split_by_worker(shards: List[str], worker_id: int,
                    num_workers: int) -> List[str]:
    """Per-dataloader-worker shard slice within a host."""
    if num_workers <= 1:
        return list(shards)
    return list(shards[worker_id::num_workers])


class _StopWorker(Exception):
    """Raised inside an inline (thread) worker when the consumer is gone."""


def _qput(out_q, item, stop):
    """out_q.put that stays responsive to a consumer-side stop event —
    threads can't be terminated, so an inline worker blocked on a full
    queue would otherwise live (holding its shuffle buffer) forever."""
    if stop is None:
        out_q.put(item)
        return
    while True:
        if stop.is_set():
            raise _StopWorker
        try:
            out_q.put(item, timeout=0.5)
            return
        except queue.Full:
            continue


def _worker_loop(shards, seed, shuffle, shuffle_buffer, preprocess,
                 tokenizer, context_length, batch_size, out_q,
                 skip_samples: int = 0, stop=None, draft_size=None):
    """Decode worker: stream its shard slice, emit ready (images, texts)
    batches. Runs in a separate process (real decode parallelism — PIL is
    CPU-bound) or inline. `skip_samples` raw samples are skipped BEFORE
    decode — the cheap consumed-samples fast-forward on resume (megatron
    data_samplers.py:14-48 semantics; tar read is ~free vs PIL decode).
    `stop` (inline thread workers only): event the consumer sets when it
    exits early; every queue put watches it."""
    rng = random.Random(seed)
    imgs, caps = [], []
    try:
        buf = []
        for shard in shards:
            for raw in iterate_tar_samples(shard):
                if skip_samples > 0:
                    skip_samples -= 1
                    continue
                decoded = decode_sample(raw, draft_size)
                if decoded is None:
                    continue
                if shuffle:
                    buf.append(decoded)
                    if len(buf) < shuffle_buffer:
                        continue
                    i = rng.randrange(len(buf))
                    buf[i], item = buf[-1], buf[i]
                    buf.pop()
                else:
                    item = decoded
                img, cap = item
                imgs.append(preprocess(img))
                caps.append(cap)
                if len(imgs) == batch_size:
                    _qput(out_q, (np.stack(imgs),
                                  np.asarray(tokenizer(caps, context_length),
                                             np.int32)), stop)
                    imgs, caps = [], []
        if shuffle:
            rng.shuffle(buf)
        for img, cap in buf:
            imgs.append(preprocess(img))
            caps.append(cap)
            if len(imgs) == batch_size:
                _qput(out_q, (np.stack(imgs),
                              np.asarray(tokenizer(caps, context_length),
                                         np.int32)), stop)
                imgs, caps = [], []
    except _StopWorker:
        pass
    finally:
        try:
            _qput(out_q, None, stop)
        except _StopWorker:
            pass


def device_prefetch(iterator, size: int = 2):
    """Stage host batches onto the device `size` steps ahead so the H2D
    copy overlaps compute (the open_CLIP pipeline gets this from the torch
    DataLoader's pin_memory+non_blocking; here it's explicit)."""
    import collections
    import jax
    buf = collections.deque()
    it = iter(iterator)
    try:
        while len(buf) < size:
            buf.append(jax.device_put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(jax.device_put(next(it)))
        except StopIteration:
            pass
        yield out


class WdsData:
    """Shard-streaming (image, caption) batch iterator.

    rank/world_size split shards per host (split_by_node); `workers` > 1
    spawns decode processes each owning a worker shard slice."""

    def __init__(self, urls, batch_size: int, preprocess: Callable,
                 tokenizer: Callable, *, num_samples: Optional[int] = None,
                 seed: int = 0, context_length: int = 77, workers: int = 2,
                 shuffle: bool = True, shuffle_buffer: int = SHUFFLE_BUFFER,
                 resampled: bool = False, rank: int = 0, world_size: int = 1,
                 upsampling_factors=None):
        if upsampling_factors is not None:
            if not resampled:
                raise ValueError("--train-data-upsampling-factors is only "
                                 "supported with --dataset-resampled "
                                 "(open_CLIP data.py has the same assert)")
            self.all_shards, self.shard_weights = expand_urls_with_weights(
                urls, upsampling_factors)
        else:
            self.all_shards = expand_urls(urls)
            self.shard_weights = None
        if resampled:
            # ResampledShards2 (data.py:274-326) does NOT split by node:
            # sampling WITH replacement from the full list is already
            # balanced, and node-splitting would both skew per-rank data
            # mixtures and break when world_size > shard count
            self.shards = list(self.all_shards)
        else:
            self.shards = split_by_node(self.all_shards, rank, world_size)
        if not self.shards:
            raise ValueError(f"no shards from {urls!r} "
                             f"(rank {rank}/{world_size})")
        if num_samples is None:
            # open_CLIP requires --train-num-samples when metadata is absent
            # (data.py:344-352); estimate by counting one shard. num_samples
            # is the GLOBAL count (num_batches divides by world_size below),
            # so scale by the full shard list, not this rank's slice.
            probe = sum(1 for _ in iterate_tar_samples(self.shards[0]))
            num_samples = probe * len(self.all_shards)
        self.num_samples = num_samples
        self.batch_size = batch_size
        # per-host batch count (open_CLIP data.py:386-398 round_fn over
        # world_size; num_samples is the global count)
        self.num_batches = max(1, num_samples // (batch_size
                                                  * max(world_size, 1)))
        self.preprocess = preprocess
        self.tokenizer = tokenizer
        self.context_length = context_length
        self.seed = seed
        self.epoch = 0
        self.rank = rank
        self.world_size = max(world_size, 1)
        self.shuffle = shuffle
        self.shuffle_buffer = shuffle_buffer
        self.workers = max(1, workers)
        self.resampled = resampled
        # JPEG decode-time downscale hint (see decode_sample): decode at the
        # smallest libjpeg DCT scale still covering the training resolution
        self.draft_size = (None if os.environ.get("MCT_JPEG_DRAFT", "1") == "0"
                           else getattr(preprocess, "image_size", None))
        self._skip_batches = 0

    def skip_batches(self, n: int) -> None:
        """Fast-forward the NEXT epoch iteration by n batches without
        decoding (mid-epoch resume). The skip happens on raw tar entries
        inside the workers; the epoch yields num_batches - n batches."""
        self._skip_batches = max(0, int(n))

    def set_epoch(self, epoch: int) -> None:
        """Sync the shard-order/seed epoch on resume (detshuffle2's
        epoch-keyed determinism, data.py:242-273): a restart into epoch N
        must shuffle with seed+N, not seed+0, or the mid-epoch
        skip_batches fast-forward skips the WRONG samples."""
        self.epoch = int(epoch)

    def _epoch_shards(self) -> List[str]:
        if self.resampled:
            # ResampledShards2 semantics (data.py:274-326): each rank draws
            # its epoch's shards WITH replacement from the FULL list
            # (rank-keyed rng so ranks differ); per-source weights implement
            # --train-data-upsampling-factors
            rng = random.Random((self.seed + self.epoch) * 1000003
                                + self.rank)
            k = max(1, len(self.shards) // self.world_size)
            if self.shard_weights is not None:
                shards = rng.choices(self.shards,
                                     weights=self.shard_weights, k=k)
            else:
                shards = [rng.choice(self.shards) for _ in range(k)]
        else:
            # detshuffle2 semantics: shard order = f(seed, epoch), same on
            # every host (data.py:242-273)
            shards = list(self.shards)
            if self.shuffle:
                random.Random(self.seed + self.epoch).shuffle(shards)
        self.epoch += 1
        return shards

    def __iter__(self):
        shards = self._epoch_shards()
        n_workers = min(self.workers, len(shards))
        base_seed = self.seed * 100003 + self.epoch
        skip_b = self._skip_batches
        self._skip_batches = 0
        # the consumer below drains workers round-robin in WHOLE batches,
        # so the original run consumed ceil((skip_b - w) / nw) batches from
        # worker w — skip exactly those samples per worker (sample-level
        # splitting would re-train some samples and drop others). Exact
        # while every worker had >= its skipped count before exhausting
        # (true for any mid-epoch resume shorter than the shortest worker
        # stream).
        nw = max(n_workers, 1)
        skips = [self.batch_size * max(0, -(-(skip_b - w) // nw))
                 for w in range(nw)]

        stop_evt = None
        if n_workers <= 1:
            # inline: one background thread keeps decode off the train loop
            q: "queue.Queue" = queue.Queue(maxsize=8)
            stop_evt = threading.Event()
            t = threading.Thread(
                target=_worker_loop,
                args=(shards, base_seed, self.shuffle, self.shuffle_buffer,
                      self.preprocess, self.tokenizer, self.context_length,
                      self.batch_size, q, skips[0], stop_evt,
                      self.draft_size),
                daemon=True)
            t.start()
            queues, live = [q], 1
        procs = []
        if n_workers > 1:
            ctx = mp.get_context("fork" if os.name == "posix" else "spawn")
            queues = []
            for w in range(n_workers):
                wq = ctx.Queue(maxsize=4)
                slice_w = split_by_worker(shards, w, n_workers)
                p = ctx.Process(
                    target=_worker_loop,
                    args=(slice_w, base_seed + w, self.shuffle,
                          max(1, self.shuffle_buffer // n_workers),
                          self.preprocess, self.tokenizer,
                          self.context_length, self.batch_size, wq,
                          skips[w], None, self.draft_size),
                    daemon=True)
                p.start()
                queues.append(wq)
                procs.append(p)
            live = n_workers

        produced, w = 0, 0
        target = max(0, self.num_batches - skip_b)
        alive = [True] * len(queues)
        try:
            while produced < target and live > 0:
                if not alive[w]:
                    w = (w + 1) % len(queues)
                    continue
                item = queues[w].get()
                if item is None:
                    alive[w] = False
                    live -= 1
                else:
                    produced += 1
                    yield item
                w = (w + 1) % len(queues)
        finally:
            # an early-exiting consumer (break at total_steps, exception,
            # or simply target reached while workers still stream) must not
            # leave fork'd decode processes blocked on queue.put forever —
            # they hold copy-on-write copies of the parent
            for p in procs:
                if p.is_alive():
                    p.terminate()
            if stop_evt is not None:
                # inline thread worker: signal it and drain its queue so a
                # blocked put wakes promptly (threads can't be terminated)
                stop_evt.set()
                try:
                    while True:
                        queues[0].get_nowait()
                except queue.Empty:
                    pass
            for q_ in queues:
                if hasattr(q_, "cancel_join_thread"):
                    q_.cancel_join_thread()
