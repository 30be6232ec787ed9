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
