"""Fine-grained chained timings of the pair-expansion sub-ops on the chip.

Every benchmarked function feeds part of its output back into the next
iteration's input (chained), so the axon memoizer can never hit and the
stream is strictly serialized.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_expand.py
"""

from __future__ import annotations

import json
import time

import numpy as np

M = 1 << 21        # max_pairs
N = 1 << 17        # capacity
NT, K = 1904, 512
ITERS = 20


def chain_timed(name, fn, state, results, n=ITERS):
    import jax

    f = jax.jit(fn)
    s = state
    s = f(s)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(s)
    jax.block_until_ready(s)
    results[name] = round((time.perf_counter() - t0) / n * 1000.0, 3)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    results = {}

    # --- cumsum / cummax over M ---
    x = jnp.asarray(rng.standard_normal(M), jnp.float32)
    chain_timed("cumsum_2M_f32", lambda v: jnp.cumsum(v) * 1e-6, x, results)
    xi = jnp.asarray(rng.integers(0, 1 << 30, M), jnp.int32)
    chain_timed("cummax_2M_i32", lambda v: jax.lax.cummax(v) - 1, xi, results)

    # --- sorts, chained (output xors back in) ---
    chain_timed("sort_2M_single", lambda v: jax.lax.sort(v ^ 1, is_stable=False),
                xi, results)

    def sort_pay(s):
        k, p = s
        sk, sp = jax.lax.sort((k ^ 1, p), num_keys=1, is_stable=False)
        return sk, sp

    chain_timed("sort_2M_payload", sort_pay, (xi, xi), results)
    x4 = jnp.concatenate([xi, xi ^ 3])
    chain_timed("sort_4M_single", lambda v: jax.lax.sort(v ^ 1, is_stable=False),
                x4, results)
    chain_timed("sort_4M_payload", sort_pay, (x4, x4), results)

    # --- argsort N (u32 keys, int payload) ---
    ni = jnp.asarray(rng.integers(0, 1 << 30, N), jnp.int32)
    chain_timed("argsort_131k", lambda v: jnp.argsort(v ^ 1), ni, results)

    # --- row gather (M, 6) from (N, 6) ---
    pack6 = jnp.asarray(rng.standard_normal((N, 6)), jnp.float32)
    gid = jnp.asarray(rng.integers(0, N, M), jnp.int32)

    def gath(s):
        g, p = s
        out = p[g]                       # (M, 6)
        return (g + 1) % N, p + 1e-9 * out[0, 0]

    chain_timed("rowgather_2Mx6", gath, (gid, pack6), results)

    # --- row gather (M, 16) from (N, 16) ---
    pack16 = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)

    def gath16(s):
        g, p = s
        out = p[g]
        return (g + 1) % N, p + 1e-9 * out[0, 0]

    chain_timed("rowgather_2Mx16", gath16, (gid, pack16), results)

    # --- 1-D gather of M scalars ---
    col = jnp.asarray(rng.standard_normal(N), jnp.float32)

    def gath1(s):
        g, c = s
        return (g + 1) % N, c + 1e-9 * c[g][0]

    chain_timed("gather_2Mx1", gath1, (gid, col), results)

    # --- scatter M values into NT*K (like tile_gauss build) ---
    tgt = jnp.asarray(rng.integers(0, NT * K, M), jnp.int32)
    vals = jnp.asarray(rng.integers(0, N, M), jnp.int32)

    def scat(s):
        t, v = s
        out = jnp.full((NT * K,), -1, jnp.int32).at[t].set(v, mode="drop")
        return (t + 1) % (NT * K), v ^ out[0]

    chain_timed("scatter_2M_into_1M", scat, (tgt, vals), results)

    # --- scatter-max N into M (the seed scatter) ---
    starts = jnp.asarray(np.sort(rng.integers(0, M, N)).astype(np.int32))

    def scatmax(s):
        st = s
        seed = jnp.zeros((M,), jnp.int32).at[st].max(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
        return (st + seed[0] + 1) % M

    chain_timed("scattermax_131k_into_2M", scatmax, starts, results)

    # --- scatter-add rows (M,16) accumulating into (N,16) (composite bwd) ---
    datt = jnp.asarray(rng.standard_normal((M, 16)), jnp.float32)

    def scatadd(s):
        g, d = s
        out = jnp.zeros((N, 16), jnp.float32).at[g].add(d, mode="drop")
        return (g + 1) % N, d + 1e-9 * out[0, 0]

    chain_timed("rowscatteradd_2Mx16", scatadd, (gid, datt), results)

    # --- searchsorted NT queries over sorted M ---
    sk = jnp.sort(jnp.asarray(rng.integers(0, NT, M), jnp.int32))
    q = jnp.arange(NT, dtype=jnp.int32)

    def ss(s):
        arr = s
        st = jnp.searchsorted(arr, q, side="left")
        return arr + (st[0] % 2)

    chain_timed("searchsorted_1900_over_2M", ss, sk, results)

    # --- the float-reciprocal div/mod + tile id math over M ---
    wxv = jnp.asarray(rng.integers(1, 40, M), jnp.int32)
    loc = jnp.asarray(rng.integers(0, 1 << 10, M), jnp.int32)

    def divmod_(s):
        l, w = s
        gwf = jnp.maximum(w, 1).astype(jnp.float32)
        ty = jnp.floor((l.astype(jnp.float32) + 0.5) / gwf).astype(jnp.int32)
        tx = l - ty * w
        tid = (ty * 50 + tx)
        return (l + 1) & 1023, w ^ (tid & 1)

    chain_timed("divmod_tileid_2M", divmod_, (loc, wxv), results)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
