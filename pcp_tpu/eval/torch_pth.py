"""Torch-free reader for PyTorch ``.pth`` checkpoints (zip serialization).

The reference computes LPIPS from pretrained torch weights
(lpipsPyTorch/__init__.py:6-30 loads torchvision AlexNet + the LPIPS linear
heads). This environment must be able to ingest user-supplied ``.pth`` files
WITHOUT importing torch, so this module re-implements just enough of
``torch.load`` for inference weights:

- the modern zipfile container (``archive/data.pkl`` + ``archive/data/<key>``
  raw little-endian storages, the default since torch 1.6);
- a RESTRICTED unpickler: only the handful of globals a plain
  ``state_dict`` pickle needs are mapped (tensor/parameter rebuild hooks,
  storage dtype markers, OrderedDict); any other global raises — a ``.pth``
  is arbitrary-code-execution under a full unpickler, so everything outside
  this allowlist is rejected by construction.

Returns plain ``{name: np.ndarray}`` dicts. Sparse/quantized tensors and the
pre-1.6 legacy tar format are out of scope (clear error instead).
"""

from __future__ import annotations

import collections
import io
import pickle
import zipfile
from typing import Dict

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    # bfloat16 has no numpy dtype: widen via a uint16 view later
    "BFloat16Storage": np.dtype("<u2"),
}


class _StorageMarker:
    """Stand-in for a ``torch.XxxStorage`` global in the pickle stream."""

    def __init__(self, name: str):
        self.name = name
        if name not in _STORAGE_DTYPES:
            raise ValueError(f"unsupported torch storage type: {name}")
        self.dtype = _STORAGE_DTYPES[name]
        self.is_bf16 = name == "BFloat16Storage"


class _Storage:
    """A loaded raw storage (1-D typed buffer)."""

    def __init__(self, array: np.ndarray, is_bf16: bool):
        self.array = array
        self.is_bf16 = is_bf16


def _bf16_to_f32(u16: np.ndarray) -> np.ndarray:
    return (u16.astype(np.uint32) << 16).view(np.float32)


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       *_unused):
    """torch._utils._rebuild_tensor_v2 -> numpy (copies, C-contiguous)."""
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    arr = storage.array
    n = int(np.prod(size)) if size else 1
    if not size:
        out = arr[storage_offset:storage_offset + 1].copy().reshape(())
    else:
        # contiguous fast path; otherwise strided view then copy
        contig = []
        acc = 1
        for s in reversed(size):
            contig.append(acc)
            acc *= s
        contig = tuple(reversed(contig))
        if stride == contig:
            out = arr[storage_offset:storage_offset + n].copy().reshape(size)
        else:
            itemsize = arr.itemsize
            out = np.lib.stride_tricks.as_strided(
                arr[storage_offset:],
                shape=size,
                strides=tuple(s * itemsize for s in stride),
            ).copy()
    if storage.is_bf16:
        out = _bf16_to_f32(out)
    return out


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


def _noop(*args, **kwargs):  # e.g. torch.serialization._get_layout
    return None


_ALLOWED = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("collections", "OrderedDict"): collections.OrderedDict,
    ("torch.serialization", "_get_layout"): _noop,
}


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, file, load_storage):
        super().__init__(file)
        self._load_storage = load_storage

    def find_class(self, module, name):
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageMarker(name)
        if (module, name) in _ALLOWED:
            return _ALLOWED[(module, name)]
        raise pickle.UnpicklingError(
            f"refusing to unpickle global {module}.{name} from a .pth file "
            f"(only plain tensor state_dicts are supported)"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id: {pid!r}")
        _, marker, key, _location, _numel = pid
        return self._load_storage(marker, str(key))


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Read a torch zip-format checkpoint into ``{key: np.ndarray}``.

    Nested containers (dicts holding a ``state_dict`` entry, etc.) are
    flattened with ``/``-joined prefixes; non-tensor leaves are kept only if
    they are ints/floats/strings."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl:
            raise ValueError(
                f"{path}: not a torch zip checkpoint (no data.pkl; the "
                f"pre-1.6 legacy format is not supported)"
            )
        prefix = pkl[0][: -len("data.pkl")]

        byteorder = "little"
        bo_name = prefix + "byteorder"
        if bo_name in names:
            byteorder = zf.read(bo_name).decode().strip()
        if byteorder != "little":
            raise ValueError(f"{path}: {byteorder}-endian .pth not supported")

        def load_storage(marker: _StorageMarker, key: str) -> _Storage:
            raw = zf.read(f"{prefix}data/{key}")
            return _Storage(np.frombuffer(raw, marker.dtype).copy(),
                            marker.is_bf16)

        obj = _RestrictedUnpickler(
            io.BytesIO(zf.read(pkl[0])), load_storage
        ).load()

    flat: Dict[str, np.ndarray] = {}

    def walk(node, pfx):
        if isinstance(node, np.ndarray):
            flat[pfx] = node
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{pfx}/{k}" if pfx else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{pfx}/{i}" if pfx else str(i))
        elif isinstance(node, (int, float, str)) and pfx:
            flat[pfx] = node

    walk(obj, "")
    return flat
