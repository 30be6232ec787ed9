"""Load (and build on demand) the native dataset helpers.

Mirrors the reference's startup compile of megatron/data/helpers.cpp
(megatron/initialize.py:100-110, data/Makefile), but through a C ABI +
ctypes instead of pybind11. Falls back to NumPy implementations when no
compiler is available.
"""
import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "helpers.so"
_SRC = _DIR / "helpers.cpp"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not _SO.exists()
                    or _SO.stat().st_mtime < _SRC.stat().st_mtime):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     str(_SRC), "-o", str(_SO)],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(str(_SO))
            lib.build_sample_idx.restype = ctypes.c_longlong
            lib.build_mapping.restype = ctypes.c_longlong
            lib.build_blocks_mapping.restype = ctypes.c_longlong
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def build_sample_idx(sizes: np.ndarray, doc_idx: np.ndarray, seq_length: int,
                     num_epochs: int, tokens_per_epoch: int) -> np.ndarray:
    """Sequence-packing index for GPT: [num_samples+1, 2] of
    (doc_idx position, token offset) — reference helpers.cpp:build_sample_idx."""
    sizes = np.ascontiguousarray(sizes, np.int32)
    doc_idx = np.ascontiguousarray(doc_idx, np.int32)
    num_samples = (num_epochs * tokens_per_epoch - 1) // seq_length
    out = np.zeros((num_samples + 1, 2), dtype=np.int32)
    lib = _load()
    if lib is not None:
        n = lib.build_sample_idx(
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            doc_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_longlong(len(doc_idx)),
            ctypes.c_int32(seq_length), ctypes.c_int32(num_epochs),
            ctypes.c_longlong(tokens_per_epoch),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_longlong(out.size // 2))
        assert n == num_samples, (n, num_samples)
        return out
    return _build_sample_idx_np(sizes, doc_idx, seq_length, num_samples)


def _build_sample_idx_np(sizes, doc_idx, seq_length, num_samples):
    out = np.zeros((num_samples + 1, 2), dtype=np.int32)
    doc_pos, doc_offset = 0, 0
    out[0] = (doc_pos, doc_offset)
    for s in range(1, num_samples + 1):
        remaining = seq_length + 1
        while remaining > 0:
            doc_len = sizes[doc_idx[doc_pos]] - doc_offset
            remaining -= doc_len
            if remaining <= 0:
                doc_offset += doc_len + remaining - 1
                remaining = 0
            else:
                doc_pos += 1
                doc_offset = 0
                if doc_pos >= len(doc_idx):
                    doc_pos = len(doc_idx) - 1
                    remaining = 0
        out[s] = (doc_pos, doc_offset)
    return out


def build_blending_indices(weights: np.ndarray, size: int
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Weighted dataset blend (reference helpers.cpp:build_blending_indices):
    returns (dataset_index int16[size], dataset_sample_index int64[size])."""
    weights = np.ascontiguousarray(weights, np.float64)
    weights = weights / weights.sum()
    ds_index = np.zeros(size, np.int16)
    ds_sample = np.zeros(size, np.int64)
    lib = _load()
    if lib is not None:
        lib.build_blending_indices(
            ds_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ds_sample.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int32(len(weights)), ctypes.c_int64(size))
        return ds_index, ds_sample
    counts = np.zeros(len(weights), np.int64)
    for s in range(size):
        deficits = weights * (s + 1) - counts
        best = int(np.argmax(deficits))
        ds_index[s] = best
        ds_sample[s] = counts[best]
        counts[best] += 1
    return ds_index, ds_sample


def native_available() -> bool:
    return _load() is not None


# --------------------------------------------------------------------------
# BERT / ICT sentence-range mappings (reference helpers.cpp:696-700
# build_mapping / build_blocks_mapping). The C++ and NumPy paths share one
# deterministic splitmix64 stream, so they agree bit-for-bit.

_SM64_MASK = (1 << 64) - 1


def _splitmix64(state: int):
    state = (state + 0x9E3779B97F4A7C15) & _SM64_MASK
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _SM64_MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _SM64_MASK
    return state, z ^ (z >> 31)


def _shuffle_rows_np(out: np.ndarray, seed: int):
    rng = seed & _SM64_MASK
    for i in range(len(out) - 1, 0, -1):
        rng, r = _splitmix64(rng)
        j = r % (i + 1)
        out[[i, j]] = out[[j, i]]


def _mapping_args(docs, sizes):
    docs = np.ascontiguousarray(docs, np.int64)
    sizes = np.ascontiguousarray(sizes, np.int32)
    return docs, sizes


def build_mapping(docs, sizes, *, num_epochs: int, max_num_samples: int,
                  max_seq_length: int, short_seq_prob: float, seed: int,
                  min_num_sent: int = 2) -> np.ndarray:
    """BERT sentence-pair sample map: [N, 3] of (start_sentence,
    end_sentence_exclusive, target_seq_len), shuffled. `docs` is the
    [num_docs+1] sentence-boundary index; `sizes` the per-sentence token
    counts. Documents with <min_num_sent sentences or any sentence longer
    than 512 tokens are skipped (reference helpers.cpp build_mapping)."""
    docs, sizes = _mapping_args(docs, sizes)
    n_docs = len(docs) - 1
    lib = _load()
    if lib is not None:
        args = (docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_longlong(n_docs),
                sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int32(num_epochs),
                ctypes.c_longlong(max_num_samples),
                ctypes.c_int32(max_seq_length),
                ctypes.c_double(short_seq_prob),
                ctypes.c_uint64(seed), ctypes.c_int32(min_num_sent))
        n = lib.build_mapping(*args, None, ctypes.c_longlong(0))
        out = np.zeros((n, 3), np.int32)
        n2 = lib.build_mapping(
            *args, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_longlong(n))
        assert n2 == n, (n2, n)
        return out
    return _build_mapping_np(docs, sizes, num_epochs, max_num_samples,
                             max_seq_length, short_seq_prob, seed,
                             min_num_sent)


def _target_len(rng, short_ratio, max_len):
    if short_ratio == 0:
        return rng, max_len
    rng, r = _splitmix64(rng)
    if r % short_ratio == 0:
        return rng, 2 + int(r % (max_len - 1))
    return rng, max_len


def _build_mapping_np(docs, sizes, num_epochs, max_num_samples,
                      max_seq_length, short_seq_prob, seed, min_num_sent):
    short_ratio = int(round(1.0 / short_seq_prob)) if short_seq_prob > 0 else 0
    rng = seed & _SM64_MASK
    rows = []
    for _epoch in range(num_epochs):
        if len(rows) >= max_num_samples:
            break
        for doc in range(len(docs) - 1):
            first, last = int(docs[doc]), int(docs[doc + 1])
            remain = last - first
            if remain < min_num_sent:
                continue
            if np.any(sizes[first:last] > 512):
                continue
            prev_start, seq_len, num_sent = first, 0, 0
            rng, tgt = _target_len(rng, short_ratio, max_seq_length)
            for s in range(first, last):
                seq_len += int(sizes[s])
                num_sent += 1
                remain -= 1
                if ((seq_len >= tgt and remain > 1
                     and num_sent >= min_num_sent) or remain == 0):
                    rows.append((prev_start, s + 1, tgt))
                    prev_start = s + 1
                    rng, tgt = _target_len(rng, short_ratio, max_seq_length)
                    seq_len, num_sent = 0, 0
    out = np.asarray(rows, np.int32).reshape(-1, 3)
    _shuffle_rows_np(out, seed + 1)
    return out


def build_blocks_mapping(docs, sizes, title_sizes, *, num_epochs: int,
                         max_num_samples: int, max_seq_length: int,
                         seed: int, use_one_sent_blocks: bool = False
                         ) -> np.ndarray:
    """ICT/REALM block map: [N, 4] of (start_sentence, end_sentence, doc,
    block_id); per-doc budget = max_seq_length - title_sizes[doc]
    (reference helpers.cpp build_blocks_mapping)."""
    docs, sizes = _mapping_args(docs, sizes)
    title_sizes = np.ascontiguousarray(title_sizes, np.int32)
    n_docs = len(docs) - 1
    lib = _load()
    if lib is not None:
        args = (docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_longlong(n_docs),
                sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                title_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int32(num_epochs),
                ctypes.c_longlong(max_num_samples),
                ctypes.c_int32(max_seq_length),
                ctypes.c_uint64(seed),
                ctypes.c_int32(1 if use_one_sent_blocks else 0))
        n = lib.build_blocks_mapping(*args, None, ctypes.c_longlong(0))
        out = np.zeros((n, 4), np.int32)
        n2 = lib.build_blocks_mapping(
            *args, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_longlong(n))
        assert n2 == n, (n2, n)
        return out
    return _build_blocks_mapping_np(docs, sizes, title_sizes, num_epochs,
                                    max_num_samples, max_seq_length, seed,
                                    use_one_sent_blocks)


def _build_blocks_mapping_np(docs, sizes, title_sizes, num_epochs,
                             max_num_samples, max_seq_length, seed,
                             use_one_sent_blocks):
    min_num_sent = 1 if use_one_sent_blocks else 2
    rows = []
    for _epoch in range(num_epochs):
        if len(rows) >= max_num_samples:
            break
        block_id = 0
        for doc in range(len(docs) - 1):
            first, last = int(docs[doc]), int(docs[doc + 1])
            tgt = max_seq_length - int(title_sizes[doc])
            remain = last - first
            if remain < min_num_sent:
                continue
            if np.any(sizes[first:last] > 512):
                continue
            prev_start, seq_len, num_sent = first, 0, 0
            for s in range(first, last):
                seq_len += int(sizes[s])
                num_sent += 1
                remain -= 1
                if ((seq_len >= tgt and remain >= min_num_sent
                     and num_sent >= min_num_sent) or remain == 0):
                    rows.append((prev_start, s + 1, doc, block_id))
                    block_id += 1
                    prev_start = s + 1
                    seq_len, num_sent = 0, 0
    out = np.asarray(rows, np.int32).reshape(-1, 4)
    _shuffle_rows_np(out, seed + 1)
    return out
