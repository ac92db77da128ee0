"""Per-stage timing of the train step on the real TPU chip.

Times each pipeline stage in isolation (preprocess / binning / att build /
fwd render / fwd+bwd / full step) on the CANONICAL bench scene
(tools/bench_scene.py), chaining state between iterations so the axon
runtime cannot memoize identical executions. The successive numbers are
what bench.py embeds as `breakdown`.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stages.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 10


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

    results = {}

    # stage: preprocess (chain xyz by adding tiny jitter derived from out)
    @jax.jit
    def prep_fn(x):
        p = preprocess(x, scales, params["rotation"], opac, sh, viewmat,
                       intrin, (W, H), 3)
        return x + 1e-12 * p["depths"][:, None], p["rect"], p["depths"]

    x = params["xyz"]
    out = prep_fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x, rect, depths = prep_fn(x)
    jax.block_until_ready(x)
    results["preprocess_ms"] = (time.perf_counter() - t0) / ITERS * 1e3

    # stage: binning
    @jax.jit
    def bin_fn(rect, depths):
        b = binning.bin_gaussians(rect, depths, tiles_x, tiles_y,
                                  max_pairs=max_pairs,
                                  max_per_tile=MAX_PER_TILE)
        return b.tile_gauss, b.tile_count, b.n_pairs, b.max_tile_load, \
            b.n_dropped

    rect, depths = out[1], out[2]
    d = depths
    r = bin_fn(rect, d)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(ITERS):
        d = d + 1e-6
        r = bin_fn(rect, d)
    jax.block_until_ready(r)
    results["binning_ms"] = (time.perf_counter() - t0) / ITERS * 1e3

    # stage: full forward render
    @jax.jit
    def fwd_fn(x):
        img, aux = render_gaussians(
            {**params, "xyz": x}, alive, viewmat, intrin, (W, H),
            background, 3, max_per_tile=MAX_PER_TILE, max_pairs=max_pairs,
        )
        return x + 1e-12 * jnp.mean(img), img

    x = params["xyz"]
    o = fwd_fn(x)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x, img = fwd_fn(x)
    jax.block_until_ready(x)
    results["forward_ms"] = (time.perf_counter() - t0) / ITERS * 1e3

    # stage: forward + backward (grad wrt params)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    @jax.jit
    def fb_fn(x):
        def loss(p):
            img, _ = render_gaussians(
                p, alive, viewmat, intrin, (W, H), background, 3,
                max_per_tile=MAX_PER_TILE, max_pairs=max_pairs,
            )
            return jnp.mean(jnp.abs(img - gt))

        l, g = jax.value_and_grad(loss)({**params, "xyz": x})
        return x - 0.0 * g["xyz"], l

    x = params["xyz"]
    o = fb_fn(x)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x, l = fb_fn(x)
    jax.block_until_ready(x)
    results["fwd_bwd_ms"] = (time.perf_counter() - t0) / ITERS * 1e3

    # stage: full train step (incl. SSIM, appearance, adam, stats)
    app = init_appearance(jax.random.PRNGKey(0), (W, H))
    state = TrainState(params=params, app=app, opt_g=optim.init_adam(params),
                       opt_a=optim.init_adam(app), alive=alive,
                       stats=G.init_densify_stats(CAPACITY))
    step = make_train_step(ocfg, (W, H), 30.0, use_appearance=True)
    state, m = step(state, viewmat, intrin, gt, jnp.int32(0), background, 3)
    jax.block_until_ready(state.params["xyz"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, viewmat, intrin, gt, jnp.int32(0),
                        background, 3)
    jax.block_until_ready(state.params["xyz"])
    results["full_step_ms"] = (time.perf_counter() - t0) / ITERS * 1e3

    results["n_pairs"] = int(r[2])
    results["max_tile_load"] = int(r[3])
    results["n_dropped"] = int(r[4])
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
