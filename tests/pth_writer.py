"""Author torch zip-format ``.pth`` checkpoints with pure stdlib.

The production reader (pcp_tpu/eval/torch_pth.py) must be exercisable in
torch-free environments, so the test fixtures cannot be written with
``torch.save``. This module emits the same container torch >= 1.6 writes —
a ZIP with ``archive/data.pkl`` (protocol-2 pickle whose tensors are
``torch._utils._rebuild_tensor_v2`` calls over persistent-id storages) and
``archive/data/<key>`` raw little-endian buffers — using only ``zipfile``
+ ``pickle``.

The torch globals the pickle references are satisfied by stub modules
injected into ``sys.modules`` for the duration of the dump (skipped when a
real torch is importable: the emitted opcodes are identical either way,
since pickle only records module/qualname strings).
"""

from __future__ import annotations

import collections
import io
import pickle
import sys
import types
import zipfile

import numpy as np

_STORAGE_FOR_DTYPE = {
    np.dtype("<f4"): "FloatStorage",
    np.dtype("<f8"): "DoubleStorage",
    np.dtype("<f2"): "HalfStorage",
    np.dtype("<i8"): "LongStorage",
    np.dtype("<i4"): "IntStorage",
    np.dtype("<i2"): "ShortStorage",
    np.dtype("i1"): "CharStorage",
    np.dtype("u1"): "ByteStorage",
    np.dtype("?"): "BoolStorage",
}
_ALL_STORAGES = list(_STORAGE_FOR_DTYPE.values()) + ["BFloat16Storage"]


def f32_to_bf16_bits(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest-even f32 -> bf16 bit pattern (uint16)."""
    u = np.ascontiguousarray(x, np.float32).view(np.uint32)
    rounded = u + 0x7FFF + ((u >> 16) & 1)
    return (rounded >> 16).astype(np.uint16)


def bf16_bits_to_f32(u16: np.ndarray) -> np.ndarray:
    return (u16.astype(np.uint32) << 16).view(np.float32)


class Tensor:
    """A tensor leaf for ``save_pth``: an ndarray plus optional torch-side
    metadata. ``bf16=True`` stores the f32 input as a BFloat16Storage.
    ``strides`` (in elements) + a flat ``buffer`` express non-contiguous
    views (e.g. a transpose) the way torch serializes them: the storage is
    the underlying buffer, the tensor header carries size/stride/offset."""

    def __init__(self, array, bf16=False, buffer=None, strides=None,
                 offset=0):
        self.array = np.asarray(array)
        self.bf16 = bf16
        self.buffer = self.array.reshape(-1) if buffer is None else buffer
        if strides is None:
            strides = []
            acc = 1
            for s in reversed(self.array.shape):
                strides.append(acc)
                acc *= s
            strides = tuple(reversed(strides))
        self.strides = tuple(strides)
        self.offset = offset


def _ensure_stub_torch():
    """Make ``torch``/``torch._utils`` importable for pickle's save_global.

    pickle verifies every GLOBAL against an importable attribute; stubs
    satisfy it without torch. No-op when torch is really installed."""
    try:
        import torch  # noqa: F401
        return
    except ImportError:
        pass
    if "torch" in sys.modules and "torch._utils" in sys.modules:
        return
    torch_mod = types.ModuleType("torch")
    utils_mod = types.ModuleType("torch._utils")

    def _rebuild_tensor_v2(*a, **k):  # never called; only pickled by name
        raise NotImplementedError

    _rebuild_tensor_v2.__module__ = "torch._utils"
    _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"
    utils_mod._rebuild_tensor_v2 = _rebuild_tensor_v2
    for name in _ALL_STORAGES:
        setattr(torch_mod, name, type(name, (), {"__module__": "torch"}))
    torch_mod._utils = utils_mod
    sys.modules["torch"] = torch_mod
    sys.modules["torch._utils"] = utils_mod


class _Pickler(pickle._Pickler):
    """Serializes ``Tensor`` leaves as _rebuild_tensor_v2(storage, ...)
    calls, collecting raw storage buffers into ``self.storages``.

    Subclasses the PYTHON pickler (pickle._Pickler): the C-accelerated one
    does not dispatch through an overridable ``save``."""

    def __init__(self, file):
        super().__init__(file, protocol=2)
        self.storages = []  # [(key, bytes)]
        self._seen = {}     # id(buffer) -> (key, storage_cls)

    def persistent_id(self, obj):
        if isinstance(obj, _StorageRef):
            return ("storage", obj.cls, obj.key, "cpu", obj.numel)
        return None

    def save(self, obj, save_persistent_id=True):
        if isinstance(obj, Tensor):
            import torch as _t  # stub or real; only names are used

            buf = obj.buffer
            if obj.bf16:
                raw = f32_to_bf16_bits(buf).tobytes()
                cls = getattr(_t, "BFloat16Storage")
            else:
                dt = buf.dtype.newbyteorder("<")
                cls = getattr(_t, _STORAGE_FOR_DTYPE[np.dtype(dt)])
                raw = np.ascontiguousarray(buf).astype(dt).tobytes()
            k = id(buf)
            if k not in self._seen:
                key = str(len(self.storages))
                self.storages.append((key, raw))
                self._seen[k] = (key, cls)
            key, cls = self._seen[k]
            rebuild = sys.modules["torch._utils"]._rebuild_tensor_v2
            reduced = (
                rebuild,
                (
                    _StorageRef(cls, key, buf.size),
                    obj.offset,
                    tuple(int(s) for s in obj.array.shape),
                    obj.strides,
                    False,
                    collections.OrderedDict(),
                ),
            )
            return self.save_reduce(obj=obj, *reduced)
        return super().save(obj, save_persistent_id)


class _StorageRef:
    def __init__(self, cls, key, numel):
        self.cls = cls
        self.key = key
        self.numel = numel


def save_pth(obj, path: str) -> None:
    """Write ``obj`` (nested dicts/lists of ``Tensor``/ndarray/scalars) as
    a torch zip checkpoint. Plain ndarrays are wrapped as contiguous
    ``Tensor`` leaves."""
    _ensure_stub_torch()

    def wrap(node):
        if isinstance(node, Tensor):
            return node
        if isinstance(node, np.ndarray):
            return Tensor(node)
        if isinstance(node, dict):
            return collections.OrderedDict(
                (k, wrap(v)) for k, v in node.items())
        if isinstance(node, (list, tuple)):
            return type(node)(wrap(v) for v in node)
        return node

    bio = io.BytesIO()
    p = _Pickler(bio)
    p.dump(wrap(obj))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", bio.getvalue())
        for key, raw in p.storages:
            zf.writestr(f"archive/data/{key}", raw)
        zf.writestr("archive/version", "3\n")
        zf.writestr("archive/byteorder", "little")
