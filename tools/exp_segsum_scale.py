"""Bisect the segsum-backward pieces AT REFERENCE SCALE and race the
Mosaic sorted-segment-sum kernel against them (round-5 items 2/4/7).

Geometry defaults: M = 12.4M table slots (the quality run's post-retune
table), N = 2^21 capacity, ~720k alive gids — the operating point where
the round-4 roofline attributes ~393 ms above light to XLA per-element
sort/gather/scatter lowerings.

Timing method: K iterations INSIDE one jitted `lax.scan` whose carry is
a value-dependent f32 scalar injected into every iteration's input and
derived from every iteration's output. Two hard-won axon-tunnel rules:
(1) host-side chained-eps loops (exp_segsum.py's harness) report
phantom ~0 ms — the runtime appears to dedupe value-identical queued
work, so the chain must run in-scan; (2) big arrays MUST be jit
ARGUMENTS — closing over them embeds them as HLO constants and the
remote-compile HTTP body blows its length limit (HTTP 413).
Digests are full sum-of-squares reductions: a last-element digest lets
XLA push the slice through elementwise ops and gathers and skip the
work entirely (measured: phantom 0.5 ms "gathers" over 14.5M indices).
Reported per-iter time = (T(K) - T(1)) / (K - 1) from single calls.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_segsum_scale.py
       [--m 12400000] [--cap 21] [--alive 720000] [--only a,b,c]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_ITERS = 7


def timed(name, piece, *arrays, k=K_ITERS):
    """piece: (f32 scalar, *arrays) -> f32 scalar digest; k reps in-scan."""
    import jax
    import jax.numpy as jnp

    try:
        def prog(seed, reps, *arrs):
            def body(s, _):
                dig = piece(s, *arrs)
                return jnp.minimum(jnp.abs(dig), 1e-30) + seed * 1e-40, None

            out, _ = jax.lax.scan(body, seed * 1e-35, None, length=reps)
            return out

        p1 = jax.jit(lambda s, *a: prog(s, 1, *a))
        pk = jax.jit(lambda s, *a: prog(s, k, *a))
        jax.block_until_ready(p1(jnp.float32(1.0), *arrays))   # compile
        jax.block_until_ready(pk(jnp.float32(1.0), *arrays))   # compile
        t0 = time.perf_counter()
        jax.block_until_ready(p1(jnp.float32(2.0), *arrays))
        t1 = time.perf_counter()
        jax.block_until_ready(pk(jnp.float32(3.0), *arrays))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / (k - 1) * 1e3
        print(f"{name:24s} {dt:8.2f} ms   (1-rep call {((t1-t0))*1e3:7.1f})",
              flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 — keep measuring the rest
        print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)
        traceback.print_exc()
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=12_400_000)
    ap.add_argument("--cap", type=int, default=21)
    ap.add_argument("--alive", type=int, default=720_000)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    M, N = args.m, 1 << args.cap
    sel = set(args.only.split(",")) if args.only else None

    def on(name):
        return sel is None or name in sel

    print(f"M={M} N={N} alive={args.alive}", flush=True)
    rng = np.random.default_rng(7)
    alive_ids = rng.choice(N, size=args.alive, replace=False)
    idc_h = alive_ids[rng.integers(0, args.alive, size=M)].astype(np.int32)
    idc = jnp.asarray(idc_h)
    g = jnp.asarray(rng.normal(size=(9, M)).astype(np.float32))
    iota_m = jnp.arange(M, dtype=jnp.int32)

    def dig(x):
        x = x.ravel()
        return jnp.vdot(x, x)

    if on("baseline"):
        timed("baseline", lambda s, a: dig(a + s), g)

    # ---- current production chain pieces ----
    keys = jnp.concatenate(
        [idc * 2 + 1, jnp.arange(N, dtype=jnp.int32) * 2])
    pay_mn = jnp.arange(M + N, dtype=jnp.int32)
    if on("sort_mn"):
        def p_sort_mn(s, kk, pp):
            k2 = kk + (s > 1e20).astype(jnp.int32)
            _, sp = jax.lax.sort((k2, pp), num_keys=1, is_stable=False)
            return (sp[-1] % 3).astype(jnp.float32) * 1e-30
        timed("sort_mn", p_sort_mn, keys, pay_mn)

    s_key, s_pay = jax.jit(
        lambda kk, pp: jax.lax.sort((kk, pp), num_keys=1, is_stable=False)
    )(keys, pay_mn)
    g_pad = jnp.concatenate([g, jnp.zeros((9, 1), g.dtype)], axis=1)
    src = jnp.minimum(s_pay, M)
    if on("gather_big"):
        timed("gather_big",
              lambda s, a, o: dig(jnp.take(a + s, o, axis=1)), g_pad, src)
    gs_big = jax.jit(lambda a, o: jnp.take(a, o, axis=1))(g_pad, src)
    if on("cumsum_big"):
        timed("cumsum_big",
              lambda s, a: dig(jnp.cumsum(a + s, axis=1)), gs_big)
    ecs = jax.jit(
        lambda a: jnp.pad(jnp.cumsum(a, axis=1), ((0, 0), (1, 0))))(gs_big)
    is_sent = (s_key % 2) == 0
    pos = jnp.nonzero(is_sent, size=N)[0].astype(jnp.int32)
    pos_ext = jnp.concatenate([pos, jnp.full((1,), M + N, jnp.int32)])
    if on("posgather"):
        timed("posgather",
              lambda s, c, p: dig(jnp.diff(
                  jnp.take(c + s, p, axis=1), axis=1)), ecs, pos_ext)
    if on("posgather_s"):
        timed("posgather_s",
              lambda s, c, p: dig(jnp.diff(
                  (c + s).at[:, p].get(
                      indices_are_sorted=True,
                      mode="promise_in_bounds"), axis=1)),
              ecs, pos_ext)

    if on("scatter_dup"):
        z = jnp.zeros((9, N), jnp.float32)
        timed("scatter_dup",
              lambda s, zz, ii, gg: dig(zz.at[:, ii].add(gg + s)),
              z, idc, g)

    # ---- kernel prerequisites + kernel ----
    s_gid, order = jax.jit(
        lambda ii, io: jax.lax.sort((ii, io), num_keys=1, is_stable=False)
    )(idc, iota_m)
    if on("sort_gid"):
        def p_sort_gid(s, ii, io):
            k2 = ii + (s > 1e20).astype(jnp.int32)
            _, sp = jax.lax.sort((k2, io), num_keys=1, is_stable=False)
            return (sp[-1] % 3).astype(jnp.float32) * 1e-30
        timed("sort_gid", p_sort_gid, idc, iota_m)
    if on("gather_g"):
        timed("gather_g",
              lambda s, a, o: dig(jnp.take(a + s, o, axis=1)), g, order)
    gs = jax.jit(lambda a, o: jnp.take(a, o, axis=1))(g, order)

    if on("scatter_srt"):
        z = jnp.zeros((9, N), jnp.float32)
        timed("scatter_srt",
              lambda s, zz, ii, gg: dig(zz.at[:, ii].add(
                  gg + s, indices_are_sorted=True)), z, s_gid, gs)

    from pcp_tpu.ops.segsum_pallas import sorted_segment_sum

    ref = None
    for nm, md in (("kernel_split", "split"), ("kernel_bf16", "bf16"),
                   ("kernel_f32", "f32")):
        if not on(nm):
            continue
        dt = timed(nm,
                   lambda s, a, ii, _md=md: dig(sorted_segment_sum(
                       a + s, ii, N, mode=_md)), gs, s_gid)
        if dt is not None:
            out = jax.jit(
                lambda a, ii, _md=md: sorted_segment_sum(
                    a, ii, N, mode=_md))(gs, s_gid)
            if ref is None:
                z = jnp.zeros((9, N), jnp.float32)
                ref = jax.jit(
                    lambda zz, ii, gg: zz.at[:, ii].add(gg))(z, s_gid, gs)
            err = float(jnp.max(jnp.abs(out - ref)))
            rel = err / (float(jnp.max(jnp.abs(ref))) + 1e-30)
            print(f"  {nm} max abs err {err:.3e} (rel {rel:.3e})",
                  flush=True)


if __name__ == "__main__":
    main()
