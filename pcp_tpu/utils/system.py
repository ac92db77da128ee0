"""Filesystem helpers (utils/system_utils.py parity)."""

from __future__ import annotations

import os


def search_max_iteration(folder: str) -> int:
    """Largest N among iteration_<N> subdirs (searchForMaxIteration,
    system_utils.py:26-28)."""
    iters = [
        int(d.split("_")[-1])
        for d in os.listdir(folder)
        if d.startswith("iteration_") and d.split("_")[-1].isdigit()
    ]
    if not iters:
        raise FileNotFoundError(f"no iteration_* dirs in {folder}")
    return max(iters)


def mkdir_p(path: str) -> None:
    os.makedirs(path, exist_ok=True)
