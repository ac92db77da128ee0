"""Dump the compiled HLO of the bench train step (to map profiler op
names -> source ops). Writes /tmp/train_step_hlo.txt.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dump_hlo.py [K]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.train import optim
    from pcp_tpu.train.config import OptimConfig
    from pcp_tpu.train.step import TrainState, make_train_step
    import argparse

    from tools import bench_scene
    from tools.bench_scene import MAX_PER_TILE

    ap = argparse.ArgumentParser()
    ap.add_argument("k_pos", nargs="?", type=int, default=MAX_PER_TILE)
    ap.add_argument("--n", type=int, default=0)
    ap.add_argument("--cap", type=int, default=0)
    ap.add_argument("--k_lo", type=int, default=0)
    ap.add_argument("--t_hi", type=int, default=0)
    ap.add_argument("--levels", default="")
    ap.add_argument("--active_cap", type=int, default=0)
    ap.add_argument("--pair_levels", default="")
    ap.add_argument("--w", type=int, default=0)
    ap.add_argument("--h", type=int, default=0)
    args = ap.parse_args()
    max_per_tile = args.k_pos
    if args.w:
        bench_scene.W, bench_scene.H = args.w, args.h
        bench_scene.FX = bench_scene.FY = 850.0
    W, H = bench_scene.W, bench_scene.H
    CAPACITY = (1 << args.cap) if args.cap else bench_scene.CAPACITY

    rng = np.random.default_rng(0)
    mk = dict(n_points=args.n, capacity=CAPACITY) if args.n else {}
    params, alive = bench_scene.make_scene(rng, **mk)
    viewmat, intrin = bench_scene.camera()
    app = init_appearance(jax.random.PRNGKey(0), (W, H))
    state = TrainState(
        params=params, app=app, opt_g=optim.init_adam(params),
        opt_a=optim.init_adam(app), alive=alive,
        stats=G.init_densify_stats(CAPACITY),
    )
    ocfg = OptimConfig(capacity=CAPACITY, max_per_tile=max_per_tile,
                       tile_k_lo=args.k_lo, tile_hi_cap=args.t_hi,
                       tile_levels=args.levels, active_cap=args.active_cap,
                       pair_levels=args.pair_levels,
                       pairs_per_gaussian=16)
    step = make_train_step(ocfg, (W, H), 30.0, use_appearance=True)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    background = jnp.zeros(3)

    from pcp_tpu.train.step import _cached_train_step, _ocfg_key
    cached = _cached_train_step(_ocfg_key(ocfg), (W, H), True)
    lowered = cached.lower(state, viewmat, intrin, gt, jnp.int32(0),
                           background, jnp.float32(30.0), 3)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = "/tmp/train_step_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out}: {len(txt)} chars")


if __name__ == "__main__":
    main()
