"""Probe: per-fusion launch overhead on the axon backend.

One jit program with N independent small reductions over a 131k array.
If time grows ~linearly with N at >0.1 ms per extra reduction, per-kernel
launch overhead (not compute) dominates small-op stages — and the right
optimization is fewer, bigger kernels (Pallas mega-kernels), not FLOPs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_launch_overhead.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

ITERS = 30
N_ELEM = 1 << 17


def main():
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(N_ELEM,)).astype(np.float32))
    results = {}
    for n_red in [1, 4, 16, 64]:
        @jax.jit
        def f(x, eps, n=n_red):
            x = x + eps * 1e-9
            acc = jnp.float32(0)
            for i in range(n):
                # distinct unfusable reductions (different slices/powers)
                acc = acc + jnp.sum(x[i:] ** (1 + (i % 3)))
            return acc

        o = f(x, jnp.float32(0))
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for i in range(ITERS):
            o = f(x, jnp.float32(i + 1))
        jax.block_until_ready(o)
        results[f"n{n_red}_ms"] = round(
            (time.perf_counter() - t0) / ITERS * 1e3, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
