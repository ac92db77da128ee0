"""Stage breakdown at the SCALE operating point (round-3 #1 diagnosis).

The smoke scale run (block 1100: 719k pts, 1280x800, capacity 2^21,
auto K=3712) measured 1.47 s/step — ~8x the pair-proportional cost
implied by the canonical bench (3.3M pairs / 17.7M pairs-per-sec).
This tool times each stage at that operating point on the chip to find
the scale-dependent, pair-independent cost:

  suspects: binning v2 expansion slots scale with CAPACITY (2^21*16 for
  class A alone = 33.5M key slots, ~60M sorted per step, vs the bench's
  3.7M), and the composite K axis pads every tile to the max load.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_scale.py
       [--n 719802] [--cap 21] [--k 3712] [--w 1280] [--h 800]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=719802)
    ap.add_argument("--cap", type=int, default=21)   # log2 capacity
    ap.add_argument("--k", type=int, default=3712)
    ap.add_argument("--k_lo", type=int, default=0)
    ap.add_argument("--t_hi", type=int, default=0)
    ap.add_argument("--levels", default="",
                    help="N-level tile tables, 'k1:t1,k2:t2,...'")
    ap.add_argument("--active_cap", type=int, default=0)
    ap.add_argument("--pair_levels", default="",
                    help="footprint bands 'r1:c1,r2:c2,...'")
    ap.add_argument("--auto", action="store_true",
                    help="derive levels/active_cap/pair_levels from the "
                         "scene exactly like the training re-tuner")
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--h", type=int, default=800)
    ap.add_argument("--fast", action="store_true",
                    help="skip isolated stages; only forward / fwd_bwd / "
                         "full_step (end-to-end A/B iterations)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.ops import binning
    from pcp_tpu.ops.projection import TILE, preprocess
    from pcp_tpu.train import optim
    from pcp_tpu.train.config import OptimConfig, parse_tile_levels
    from pcp_tpu.train.step import TrainState, make_train_step, render_gaussians
    from tools import bench_scene

    W, H, K = args.w, args.h, args.k
    CAPACITY = 1 << args.cap
    levels = parse_tile_levels(args.levels)
    # scale the bench scene generator to this resolution
    bench_scene.W, bench_scene.H = W, H
    bench_scene.FX = bench_scene.FY = 850.0

    rng = np.random.default_rng(0)
    params, alive = bench_scene.make_scene(rng, n_points=args.n,
                                           capacity=CAPACITY)
    viewmat, intrin = bench_scene.camera()
    background = jnp.zeros(3)
    ocfg = OptimConfig(capacity=CAPACITY, max_per_tile=K,
                       tile_k_lo=args.k_lo, tile_hi_cap=args.t_hi,
                       tile_levels=args.levels, active_cap=args.active_cap,
                       pair_levels=args.pair_levels,
                       pairs_per_gaussian=16)
    tiles_x = (W + TILE - 1) // TILE
    tiles_y = (H + TILE - 1) // TILE
    max_pairs = ocfg.pairs_per_gaussian * CAPACITY

    scales = G.scaling_act(params["scaling"])
    opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
    sh = G.sh_coeffs(params)

    if args.auto:
        from pcp_tpu.ops.binning import (choose_pair_levels,
                                         choose_tile_levels,
                                         footprint_band_counts_device,
                                         tile_loads_device)
        from pcp_tpu.train.config import format_tile_levels

        @jax.jit
        def measure():
            p = preprocess(params["xyz"], scales, params["rotation"], opac,
                           sh, viewmat, intrin, (W, H), 3)
            tx = (W + TILE - 1) // TILE
            ty = (H + TILE - 1) // TILE
            return (tile_loads_device(p["rect"], tx, ty),
                    footprint_band_counts_device(p["rect"]))

        ld, bc = measure()
        loads = np.asarray(ld)[None, :]
        k0, lv = choose_tile_levels(loads, loads.shape[1])
        plv = choose_pair_levels(np.asarray(bc)[None, :])
        n_alive = int(np.asarray(alive).sum())
        acap = -(-int(1.5 * n_alive) // 65536) * 65536
        args.k_lo = k0 if lv else 0
        args.levels = format_tile_levels(lv)
        args.pair_levels = format_tile_levels(plv)
        args.active_cap = acap if acap < CAPACITY else 0
        K = args.k = lv[-1][0] if lv else k0
        levels = lv
        ocfg = OptimConfig(capacity=CAPACITY, max_per_tile=K,
                           tile_k_lo=args.k_lo, tile_hi_cap=args.t_hi,
                           tile_levels=args.levels,
                           active_cap=args.active_cap,
                           pair_levels=args.pair_levels,
                           pairs_per_gaussian=16)
        print(f"auto: k0={k0} levels=[{args.levels}] "
              f"pair_bands=[{args.pair_levels}] active_cap={args.active_cap}",
              flush=True)
    pair_lv = parse_tile_levels(args.pair_levels)

    results = {"n": args.n, "capacity": CAPACITY, "K": K,
               "k_lo": args.k_lo, "t_hi": args.t_hi, "W": W, "H": H,
               "tiles": tiles_x * tiles_y}
    results["levels"] = args.levels
    results["active_cap"] = args.active_cap
    results["pair_levels"] = args.pair_levels
    split_kw = dict(tile_k_lo=args.k_lo, tile_hi_cap=args.t_hi,
                    tile_levels=levels, active_cap=args.active_cap,
                    pair_levels=pair_lv)

    def timeit(name, fn, state0):
        s = fn(state0)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s = fn(s)
        jax.block_until_ready(s)
        results[name] = round((time.perf_counter() - t0) / ITERS * 1e3, 1)
        print(f"  {name}: {results[name]} ms", flush=True)
        return s

    # stage: preprocess
    @jax.jit
    def prep_fn(x):
        p = preprocess(x, scales, params["rotation"], opac, sh, viewmat,
                       intrin, (W, H), 3)
        return x + 1e-12 * p["depths"][:, None], p["rect"], p["depths"]

    if args.fast:
        out = jax.jit(prep_fn)(params["xyz"])
    else:
        out = timeit("preprocess_ms", lambda s: prep_fn(s[0] if isinstance(s, tuple) else s), params["xyz"])
    rect, depths = out[1], out[2]

    # stage: binning (whole)
    @jax.jit
    def bin_fn(d):
        if levels:
            b = binning.bin_gaussians_levels(
                rect, d, tiles_x, tiles_y, k0=args.k_lo or K,
                levels=levels, active_cap=args.active_cap,
                pair_levels=pair_lv)
        else:
            b = binning.bin_gaussians(rect, d, tiles_x, tiles_y,
                                      max_pairs=max_pairs, max_per_tile=K,
                                      active_cap=args.active_cap,
                                      pair_levels=pair_lv)
        return d + 0 * b.n_pairs.astype(d.dtype), b.n_pairs, b.max_tile_load

    if args.fast:
        r = jax.jit(bin_fn)(depths)
    else:
        r = timeit("binning_ms", lambda s: bin_fn(s[0] if isinstance(s, tuple) else s), depths)
    results["n_pairs"] = int(r[1])
    results["max_tile_load"] = int(r[2])

    # binning sub-stage: expansion keys only (no sort)
    from pcp_tpu.ops.binning import (CAPB_DIV, CAPC_DIV, CAPD_DIV, R1, R2, R3,
                                     _ceil_log2, _compact_classes,
                                     _expand_rows)

    num_tiles = tiles_x * tiles_y
    depth_bits = 32 - _ceil_log2(num_tiles + 1)

    @jax.jit
    def expand_fn(d):
        n = rect.shape[0]
        x0, y0 = rect[:, 0], rect[:, 1]
        wx = rect[:, 2] - rect[:, 0]
        wy = rect[:, 3] - rect[:, 1]
        counts = (wx * wy).astype(jnp.int32)
        dq = (jax.lax.bitcast_convert_type(d.astype(jnp.float32), jnp.uint32)
              >> jnp.uint32(32 - depth_bits))
        gid_all = jnp.arange(n, dtype=jnp.int32)
        counts_a = jnp.where(counts <= R1, counts, 0)
        key_a, pay_a = _expand_rows(x0, y0, wx, dq, gid_all, counts_a, R1,
                                    tiles_x, depth_bits)
        return d + 1e-12 * key_a[0].astype(jnp.float32), key_a, pay_a

    e = None
    if not args.fast:
        e = timeit("expandA_ms", lambda s: expand_fn(s[0] if isinstance(s, tuple) else s), depths)
        key_a, pay_a = e[1], e[2]
        results["key_slots_A"] = int(key_a.shape[0])

    # binning sub-stage: the sort alone at full v2 slot count
    total_slots = binning.expansion_key_slots(rect.shape[0], num_tiles,
                                              args.active_cap, pair_lv)
    results["key_slots_total"] = int(total_slots)
    keys0 = jnp.asarray(
        np.random.default_rng(1).integers(0, 2**32, total_slots,
                                          dtype=np.uint32))
    pays0 = jnp.arange(total_slots, dtype=jnp.int32)

    @jax.jit
    def sort_fn(k):
        sk, sp = jax.lax.sort((k, pays0), num_keys=1, is_stable=False)
        return sk, sp

    if not args.fast:
        timeit("sort_ms", lambda s: sort_fn(s[0] if isinstance(s, tuple) else s),
               keys0)

    # stage: full forward
    @jax.jit
    def fwd_fn(x):
        img, aux = render_gaussians(
            {**params, "xyz": x}, alive, viewmat, intrin, (W, H),
            background, 3, max_per_tile=K, max_pairs=max_pairs, **split_kw)
        return x + 1e-12 * jnp.mean(img)

    timeit("forward_ms", fwd_fn, params["xyz"])

    # stage: forward + backward
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    @jax.jit
    def fb_fn(x):
        def loss(p):
            img, _ = render_gaussians(
                p, alive, viewmat, intrin, (W, H), background, 3,
                max_per_tile=K, max_pairs=max_pairs, **split_kw)
            return jnp.mean(jnp.abs(img - gt))
        l, g = jax.value_and_grad(loss)({**params, "xyz": x})
        return x - 0.0 * g["xyz"]

    timeit("fwd_bwd_ms", fb_fn, params["xyz"])

    # stage: full train step
    app = init_appearance(jax.random.PRNGKey(0), (W, H))
    state = TrainState(params=params, app=app, opt_g=optim.init_adam(params),
                       opt_a=optim.init_adam(app), alive=alive,
                       stats=G.init_densify_stats(CAPACITY))
    step = make_train_step(ocfg, (W, H), 30.0, use_appearance=True)

    def step_fn(s):
        s2, m = step(s, viewmat, intrin, gt, jnp.int32(0), background, 3)
        return s2

    timeit("full_step_ms", step_fn, state)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
