"""Torch-free reader for PyTorch `.pt`/`.pth` checkpoints (zip format).

The reference ecosystem ships pretrained weights as torch-serialized files
(open_CLIP/src/open_clip/pretrained.py download targets, factory.py:286-338
`pretrained=` loading). A TPU serving host has no torch; this module parses
the format directly:

  a `.pt` file (torch >= 1.6) is a zip archive:
    <name>/data.pkl      pickle of the object tree; tensors are placeholders
    <name>/data/<key>    raw little-endian storage buffers
    <name>/version

  Inside the pickle, each tensor is `torch._utils._rebuild_tensor_v2(
  storage, storage_offset, size, stride, requires_grad, hooks)` where
  `storage` arrives through the pickle persistent-id protocol as
  ('storage', <StorageType>, key, location, numel).

Security: this is a *restricted* unpickler — only the torch rebuild
functions, containers, and numpy scalars needed by checkpoint files are
resolvable; any other global raises. (torch.load without weights_only is an
arbitrary-code-execution surface; this reader is not.)

Tensors come back as numpy arrays (bfloat16 via ml_dtypes, which jax ships).
"""
import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

try:  # ships with jax
    import ml_dtypes
    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": _BFLOAT16,
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
}


class _StorageType:
    def __init__(self, name):
        self.name = name


class _LazyStorage:
    """Deferred view on a zip member holding one storage's raw bytes."""

    def __init__(self, zf: zipfile.ZipFile, member: str, dtype: np.dtype,
                 numel: int):
        self.zf, self.member, self.dtype, self.numel = zf, member, dtype, numel
        self._data = None

    def read(self) -> np.ndarray:
        if self._data is None:
            raw = self.zf.read(self.member)
            self._data = np.frombuffer(raw, dtype=self.dtype,
                                       count=self.numel)
        return self._data


def _rebuild_tensor_v2(storage: _LazyStorage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    flat = storage.read()
    if not size:
        return flat[storage_offset].copy()
    itemsize = flat.dtype.itemsize
    arr = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride))
    return np.ascontiguousarray(arr)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


def _rebuild_from_type_v2(func, new_type, args, state):
    return func(*args)


_ALLOWED = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch._tensor", "_rebuild_from_type_v2"): _rebuild_from_type_v2,
    ("collections", "OrderedDict"): OrderedDict,
    ("torch", "Size"): tuple,
    ("numpy.core.multiarray", "scalar"): (
        lambda dtype, raw: np.frombuffer(raw, dtype=dtype)[0]),
    ("numpy._core.multiarray", "scalar"): (
        lambda dtype, raw: np.frombuffer(raw, dtype=dtype)[0]),
    ("numpy", "dtype"): np.dtype,
    ("_codecs", "encode"): lambda s, enc: s.encode(enc),
}


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module, name):
        fn = _ALLOWED.get((module, name))
        if fn is not None:
            return fn
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        raise pickle.UnpicklingError(
            f"pt_reader: global '{module}.{name}' is not allowed in a "
            "weights checkpoint")

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        _, storage_type, key, _location, numel = pid
        name = (storage_type.name if isinstance(storage_type, _StorageType)
                else getattr(storage_type, "__name__", str(storage_type)))
        dtype = _STORAGE_DTYPES.get(name)
        if dtype is None:
            raise pickle.UnpicklingError(f"unsupported storage type {name}")
        return _LazyStorage(self._zf, f"{self._prefix}data/{key}", dtype,
                            int(numel))


def load_pt(path: str) -> Any:
    """Load a torch zip-format checkpoint without torch. Returns the object
    tree with tensors as numpy arrays."""
    zf = zipfile.ZipFile(path)
    pkl = next((n for n in zf.namelist() if n.endswith("/data.pkl")), None)
    if pkl is None:
        raise ValueError(
            f"{path}: not a torch zip checkpoint (legacy pre-1.6 .pt files "
            "are not supported; re-save with a modern torch)")
    prefix = pkl[: -len("data.pkl")]
    with zf.open(pkl) as f:
        return _RestrictedUnpickler(io.BytesIO(f.read()), zf, prefix).load()


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load and return the checkpoint's state_dict (unwraps {'state_dict':}
    containers and 'module.' DDP prefixes, like open_CLIP main.py does)."""
    obj = load_pt(path)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: checkpoint does not contain a state dict")
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in obj.items()}
