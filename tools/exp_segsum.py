"""Isolate the segsum-backward pieces on the chip (salted, chained).

Pieces at bench scale (nt*K = 973k window slots, N = 131k capacity, 9 planes):
  sort1:   (idc_flat, iota) int32 sort           -> order, s_gid
  bounds:  searchsorted(s_gid, arange(N+1))      -> scan vs sort method
  gather:  take(g, order, axis=1)                -> (9, nt*K)
  cumsum:  jnp.cumsum axis=1                     -> (9, nt*K)
  mxuscan: two-level matmul prefix sum           -> (9, nt*K)
  diff:    cs[:, b1] - cs[:, b0]                 -> (9, N)
  scatter: the incumbent dup-index scatter-add   -> (9, N)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_segsum.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NT, K, N, NA = 1900, 512, 131072, 9
ITERS = 20


def timed(name, fn, *args):
    """fn(eps, *args) — eps is a chained traced scalar so every iteration
    has distinct inputs (the axon runtime memoizes (executable, inputs)
    ACROSS calls; un-chained loops return phantom ~0 ms timings)."""
    import jax
    import jax.numpy as jnp

    fn_j = jax.jit(fn)
    eps = jnp.float32(time.time() % 97.0)
    out = fn_j(eps, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        eps = eps + 1.0
        out = fn_j(eps, *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:28s} {dt:7.3f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp

    salt = float(time.time() % 997)  # defeat cross-process memoization
    rng = np.random.default_rng(int(salt * 1e3) % (1 << 31))
    m = NT * K
    idc = jnp.asarray(rng.integers(0, N, size=(m,)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(NA, m)).astype(np.float32)) + salt * 1e-9
    iota = jnp.arange(m, dtype=jnp.int32)

    s_gid, order = timed(
        "sort1 (key,pay) 973k",
        lambda e, a, b: jax.lax.sort(
            (a + e.astype(jnp.int32) % 3, b), num_keys=1, is_stable=False),
        idc, iota)

    q = jnp.arange(N + 1, dtype=jnp.int32)
    timed("bounds scan",
          lambda e, s: jnp.searchsorted(
              s + e.astype(jnp.int32) % 2, q, side="left"), s_gid)
    bounds = timed(
        "bounds sort-method",
        lambda e, s: jnp.searchsorted(
            s + e.astype(jnp.int32) % 2, q, side="left", method="sort"),
        s_gid)

    gs = timed("gather 9x973k",
               lambda e, a, o: jnp.take(a + e * 1e-12, o, axis=1), g, order)

    cs = timed("cumsum 9x973k",
               lambda e, x: jnp.cumsum(x + e * 1e-12, axis=1), gs)

    def mxuscan(x):
        # two-level prefix sum: 128-lane blocks via triangular matmul
        b = 128
        nb = x.shape[1] // b
        xb = x[:, : nb * b].reshape(NA, nb, b)
        tri = jnp.tril(jnp.ones((b, b), jnp.float32))
        within = jnp.einsum("anb,cb->anc", xb, tri,
                            precision=jax.lax.Precision.HIGHEST)
        carry = jnp.cumsum(within[:, :, -1], axis=1)
        carry = jnp.pad(carry[:, :-1], ((0, 0), (1, 0)))
        out = (within + carry[:, :, None]).reshape(NA, nb * b)
        return jnp.concatenate(
            [out, out[:, -1:] + jnp.cumsum(x[:, nb * b:], axis=1)], axis=1)

    timed("mxuscan 9x973k", lambda e, x: mxuscan(x + e * 1e-12), gs)

    b0, b1 = bounds[:-1].astype(jnp.int32), bounds[1:].astype(jnp.int32)
    csp = jnp.pad(cs, ((0, 0), (1, 0)))
    timed("diff gathers",
          lambda e, c: (c + e * 1e-12)[:, b1] - c[:, b0], csp)

    dz = jnp.zeros((NA, N), jnp.float32)
    timed("scatter-add incumbent",
          lambda e, z, gg: z.at[:, idc].add(gg + e * 1e-12), dz, g)


if __name__ == "__main__":
    main()
