"""pcp_tpu.native — C++ runtime components (ctypes-bound, no pybind11).

Currently: the COLMAP binary codec (colmap_codec.cpp) replacing the
reference's per-record Python struct loops (scene/colmap_loader.py:195-311).
Built lazily with g++ on first use and cached beside the source; everything
has a pure-Python fallback, so a missing toolchain only costs speed.
"""

from pcp_tpu.native.build import load_library  # noqa: F401
