"""Round-2 perf experiments on the real chip.

Answers, each standalone (run: PYTHONPATH=/root/repo:/root/.axon_site
python tools/exp_r2.py <name>):

  gather  - can Mosaic do an in-kernel dynamic gather from a VMEM-resident
            (N, NA) attribute pack with (TB, CH) indices, and how fast over
            the full composite grid?
  sort    - lax.sort cost at 2M/4M keys, single-array vs payload (re-check).
  xlagather - XLA row-gather (nt*K, NA) + transpose + scatter-add cost
            (the current composite_fused att build) at K=512 and 1024.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def timed(fn, *args, n=10, warmup=2, vary=None):
    import jax

    out = None
    for i in range(warmup):
        a = vary(args, i) if vary else args
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        a = vary(args, warmup + i) if vary else args
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def exp_gather():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1 << 17
    NA = 16
    TB, CH = 8, 128
    NT, K = 1904, 512  # 800x600 tile grid padded, 4 chunks
    rng = np.random.default_rng(0)
    pack = jnp.asarray(rng.standard_normal((N, NA)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, N, (NT, K)), jnp.int32)

    # --- form 1: per-attribute 1D take with 2D indices ---
    def k1(ids_ref, pack_ref, out_ref):
        idx = ids_ref[:]                     # (TB, CH) int32
        cols = []
        for a in range(NA):
            col = pack_ref[:, a]             # (N,)
            cols.append(jnp.take(col, idx, axis=0)[:, None, :])
        out_ref[:] = jnp.concatenate(cols, axis=1)

    # --- form 2: row take (N, NA) with flattened indices ---
    def k2(ids_ref, pack_ref, out_ref):
        idx = ids_ref[:]
        rows = jnp.take(pack_ref[:], idx.reshape(-1), axis=0)  # (TB*CH, NA)
        out_ref[:] = jnp.transpose(
            rows.reshape(TB, CH, NA), (0, 2, 1)
        )

    # --- form 3: take_along_axis on lanes: pack transposed (NA, N) ---
    def k3(ids_ref, packT_ref, out_ref):
        idx = ids_ref[:]                     # (TB, CH)
        planes = []
        for a in range(NA):
            row = packT_ref[a, :]            # (N,)
            planes.append(jnp.take(row, idx, axis=0)[:, None, :])
        out_ref[:] = jnp.concatenate(planes, axis=1)

    def build(kern, packed, transposed=False):
        p = packed
        return pl.pallas_call(
            kern,
            grid=(NT // TB, K // CH),
            in_specs=[
                pl.BlockSpec((TB, CH), lambda i, c: (i, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(p.shape, lambda i, c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, NA, CH), lambda i, c: (i, 0, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NT, NA, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(ids, p)

    for name, kern, p in [
        ("form1_col_take", k1, pack),
        ("form2_row_take", k2, pack),
        ("form3_lane_take", k3, pack.T),
    ]:
        try:
            f = jax.jit(lambda ids_, p_: build(kern, p_))
            out = build(kern, p)
            jax.block_until_ready(out)
            # correctness spot check
            ref = np.asarray(pack)[np.asarray(ids[3])]        # (K, NA)
            got = np.asarray(out)[3]                           # (NA, K)
            ok = np.allclose(got.T, ref)
            t = timed(lambda x: build(kern, x), p, vary=lambda a, i: (a[0] + 1e-7,))
            print(f"{name}: ok={ok} t={t:.2f} ms")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


def exp_sort():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for m in (1 << 21, 1 << 22):
        keys = jnp.asarray(rng.integers(0, 1 << 31, m, dtype=np.int64).astype(np.uint32))
        pay = jnp.asarray(rng.integers(0, 1 << 20, m, dtype=np.int64).astype(np.int32))

        f1 = jax.jit(lambda k: jax.lax.sort(k, is_stable=False))
        t1 = timed(f1, keys, vary=lambda a, i: (a[0] ^ jnp.uint32(i),))
        f2 = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=False))
        t2 = timed(f2, keys, pay, vary=lambda a, i: (a[0] ^ jnp.uint32(i), a[1]))
        print(f"m={m}: single={t1:.2f} ms  payload={t2:.2f} ms")


def exp_xlagather():
    import jax
    import jax.numpy as jnp

    N = 1 << 17
    NA = 16
    NT = 1904
    rng = np.random.default_rng(0)
    pack = jnp.asarray(rng.standard_normal((N, NA)), jnp.float32)
    for K in (512, 1024):
        ids = jnp.asarray(rng.integers(0, N, (NT, K)), jnp.int32)

        def fwd(p, idc):
            att = p[idc.reshape(-1)].reshape(NT, K, NA)
            return jnp.transpose(att, (0, 2, 1))

        f = jax.jit(fwd)
        t = timed(f, pack, ids, vary=lambda a, i: (a[0] + 1e-7, a[1]))
        # backward: scatter-add of datt back to pack rows
        g = jax.jit(lambda p, idc: jax.vjp(lambda pp: fwd(pp, idc), p)[1](
            jnp.ones((NT, NA, K), jnp.float32))[0])
        tb = timed(g, pack, ids, vary=lambda a, i: (a[0] + 1e-7, a[1]))
        print(f"K={K}: gather+T={t:.2f} ms  scatter-add(bwd)={tb:.2f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("gather", "all"):
        print("--- in-kernel gather ---")
        exp_gather()
    if which in ("sort", "all"):
        print("--- lax.sort ---")
        exp_sort()
    if which in ("xlagather", "all"):
        print("--- XLA att build ---")
        exp_xlagather()
