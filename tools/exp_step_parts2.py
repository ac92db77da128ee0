"""Deeper in-context bisection: preprocess vs binning vs composite bwd.

Variants (all chained so the memoizer can't fake them):
- prep_only:      preprocess fwd, outputs reduced to a scalar
- prep_bin_fwd:   preprocess + binning fwd (no composite)
- render_fwdbwd:  binning + gather + composite + L1, fwd+bwd with grads
                  wrt the PREPROCESS OUTPUTS (preprocess itself outside
                  the graph) -> isolates the render backward from the
                  EWA/SH backward
Combined with exp_step_parts (fwd_l1, fwdbwd_l1) this yields the full
budget: preprocess fwd/bwd, binning, composite fwd, composite bwd.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_step_parts2.py [K]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.ops.binning import bin_gaussians
    from pcp_tpu.ops.projection import TILE, preprocess
    from pcp_tpu.ops.rasterize import composite_fused
    from pcp_tpu.utils.loss import l1_loss
    from tools.bench_scene import CAPACITY, H, W, camera, make_scene

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rng = np.random.default_rng(0)
    params, alive = make_scene(rng)
    viewmat, intrin = camera()
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    background = jnp.zeros(3)
    tiles_x = (W + TILE - 1) // TILE
    tiles_y = (H + TILE - 1) // TILE
    opac0 = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)

    def prep_of(p, eps):
        xyz = p["xyz"] + eps * 1e-9
        return preprocess(
            xyz, G.scaling_act(p["scaling"]), p["rotation"], opac0,
            G.sh_coeffs(p), viewmat, intrin, (W, H), 3,
        )

    @jax.jit
    def prep_only(p, eps):
        pr = prep_of(p, eps)
        return sum(jnp.sum(v) for kk, v in pr.items() if v.dtype != jnp.bool_)

    @jax.jit
    def prep_bin_fwd(p, eps):
        pr = prep_of(p, eps)
        bins = bin_gaussians(pr["rect"], pr["depths"], tiles_x, tiles_y,
                             16 * CAPACITY, k)
        return (jnp.sum(bins.tile_count) + jnp.sum(bins.tile_gauss)
                + jnp.sum(pr["rgb"]))

    DIFF = ("means2d", "conics", "rgb", "opacity")

    def render_loss(diff_leaves, static_leaves):
        pr = dict(static_leaves, **diff_leaves)
        bins = bin_gaussians(pr["rect"], pr["depths"], tiles_x, tiles_y,
                             16 * CAPACITY, k)
        img, _ = composite_fused(pr, bins, (W, H), background)
        return l1_loss(img, gt)

    @jax.jit
    def render_fwdbwd(diff_leaves, static_leaves, eps):
        diff_leaves = dict(diff_leaves,
                           means2d=diff_leaves["means2d"] + eps * 1e-9)
        g = jax.grad(render_loss)(diff_leaves, static_leaves)
        return diff_leaves["means2d"] + g["means2d"] * 1e-9

    results = {"max_per_tile": k}
    pr0 = jax.jit(lambda: prep_of(params, jnp.float32(0)))()
    diff0 = {kk: pr0[kk] for kk in DIFF}
    static0 = {kk: v for kk, v in pr0.items() if kk not in DIFF}

    def bench(name, f, *args):
        o = f(*args, jnp.float32(0))
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for i in range(ITERS):
            o = f(*args, jnp.float32(i + 1))
        jax.block_until_ready(o)
        results[name] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)

    bench("prep_only_ms", prep_only, params)
    bench("prep_bin_fwd_ms", prep_bin_fwd, params)
    bench("render_fwdbwd_ms", render_fwdbwd, diff0, static0)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
