"""Lazy g++ build + ctypes loader for the native codecs.

The built .so is keyed on a content hash of the source (not mtimes, which
git does not preserve): a fresh clone always compiles from the checked-in
source rather than trusting any stale binary.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "colmap_codec.cpp")


def _so_path() -> str:
    cache = os.environ.get(
        "PCP_NATIVE_CACHE", os.path.join(os.path.dirname(__file__), "_build")
    )
    os.makedirs(cache, exist_ok=True)
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(cache, f"libcolmap_codec-{digest}.so")


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the codec; None if no working toolchain."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _so_path()
        try:
            if not os.path.exists(so):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", so],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(so)
            _configure(lib)
            _LIB = lib
        except (OSError, subprocess.SubprocessError) as e:
            import warnings

            warnings.warn(f"native colmap codec unavailable ({e}); "
                          "falling back to pure Python")
        return _LIB


def _configure(lib: ctypes.CDLL) -> None:
    import ctypes as ct

    u8p = ct.POINTER(ct.c_uint8)
    u64p = ct.POINTER(ct.c_uint64)
    lib.colmap_points3d_count.restype = ct.c_int
    lib.colmap_points3d_count.argtypes = [u8p, ct.c_uint64, u64p, u64p]
    lib.colmap_points3d_parse.restype = ct.c_int
    lib.colmap_points3d_size.restype = ct.c_uint64
    lib.colmap_points3d_size.argtypes = [ct.c_uint64, ct.c_uint64]
    lib.colmap_points3d_write.restype = ct.c_int
    lib.colmap_images_count.restype = ct.c_int
    lib.colmap_images_count.argtypes = [u8p, ct.c_uint64, u64p, u64p, u64p]
    lib.colmap_images_parse.restype = ct.c_int


_PTS_LOCK = threading.Lock()
_PTS_LIB: Optional[ctypes.CDLL] = None
_PTS_TRIED = False


def load_points_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the point-cloud ops; None without a toolchain."""
    global _PTS_LIB, _PTS_TRIED
    with _PTS_LOCK:
        if _PTS_LIB is not None or _PTS_TRIED:
            return _PTS_LIB
        _PTS_TRIED = True
        src = os.path.join(os.path.dirname(__file__), "points_native.cpp")
        cache = os.environ.get(
            "PCP_NATIVE_CACHE", os.path.join(os.path.dirname(__file__), "_build")
        )
        os.makedirs(cache, exist_ok=True)
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(cache, f"libpoints_native-{digest}.so")
        try:
            if not os.path.exists(so):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     src, "-o", so],
                    check=True, capture_output=True, timeout=120,
                )
            import ctypes as ct

            lib = ctypes.CDLL(so)
            f32p = ct.POINTER(ct.c_float)
            u8p = ct.POINTER(ct.c_uint8)
            i64p = ct.POINTER(ct.c_int64)
            lib.radius_outlier_filter.restype = ct.c_int
            lib.radius_outlier_filter.argtypes = [
                f32p, ct.c_int64, ct.c_int32, ct.c_float, u8p,
            ]
            lib.compact_points.restype = ct.c_int64
            lib.compact_points.argtypes = [f32p, u8p, ct.c_int64, f32p, i64p]
            lib.bisect_xy.restype = ct.c_int
            lib.bisect_xy.argtypes = [
                f32p, ct.c_int64, ct.c_int64, ct.c_int, i64p, i64p,
                ct.POINTER(ct.c_uint32), ct.POINTER(ct.c_int32), f32p,
                ct.c_int,
            ]
            _PTS_LIB = lib
        except (OSError, subprocess.SubprocessError) as e:
            import warnings

            warnings.warn(f"native point ops unavailable ({e}); "
                          "falling back to numpy")
        return _PTS_LIB
