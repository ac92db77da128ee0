"""Third bisection round: isolate (a) the per-Gaussian gradient
scatter-add inside the render backward, (b) the preprocess backward and
its SH-degree share.

- render_fwdbwd:            as exp_step_parts2 (reference point)
- render_fwdbwd_noscatter:  identical, but the pack-row gather carries a
                            custom VJP that returns ZERO dpack — XLA drops
                            the duplicate-index scatter-add; the delta is
                            the scatter's true in-context cost
- prep_fwdbwd / _deg0:      preprocess + weighted-sum loss, fwd+bwd, at
                            sh_degree 3 vs 0 — the delta is the SH-eval
                            share of the EWA/SH backward

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_step_parts3.py [K]
"""

from __future__ import annotations

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
    results = {"max_per_tile": k}

    def bench(name, f, *args):
        o = f(*args, jnp.float32(0))
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for i in range(ITERS):
            o = f(*args, jnp.float32(i + 1))
        jax.block_until_ready(o)
        results[name] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)

    # ---- render backward (grad-scatter mode set by PCP_GRAD_SCATTER;
    # run once with "add" and once with "off", the delta is the
    # duplicate-index scatter-add's true in-context cost) ----
    import functools

    DIFF = ("means2d", "conics", "rgb", "opacity")
    results["grad_scatter"] = os.environ.get("PCP_GRAD_SCATTER", "add")

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

    pr0 = jax.jit(lambda: preprocess(
        params["xyz"], G.scaling_act(params["scaling"]), params["rotation"],
        opac0, G.sh_coeffs(params), viewmat, intrin, (W, H), 3))()
    diff0 = {kk: pr0[kk] for kk in DIFF}
    static0 = {kk: v for kk, v in pr0.items() if kk not in DIFF}

    @jax.jit
    def render_fwd(diff_leaves, static_leaves, eps):
        diff_leaves = dict(diff_leaves,
                           means2d=diff_leaves["means2d"] + eps * 1e-9)
        return render_loss(diff_leaves, static_leaves)

    # if binning constant-folds under the static rect/depths, this is
    # ~gather+kernel fwd only (~6 ms); if it runs live, ~binning+6
    bench("render_fwd_ms", render_fwd, diff0, static0)
    bench("render_fwdbwd_ms", render_fwdbwd, diff0, static0)

    # ---- preprocess fwd+bwd, SH degree share ----
    wsum = {kk: jnp.asarray(rng.normal(size=np.shape(v)).astype(np.float32))
            for kk, v in pr0.items()
            if v.dtype == jnp.float32 and kk in DIFF}

    def prep_loss(p, deg):
        pr = preprocess(
            p["xyz"], G.scaling_act(p["scaling"]), p["rotation"], opac0,
            G.sh_coeffs(p), viewmat, intrin, (W, H), deg,
        )
        return sum(jnp.vdot(pr[kk], wsum[kk]) for kk in wsum)

    @functools.partial(jax.jit, static_argnames=("deg",))
    def prep_fwdbwd(p, deg, eps):
        p = dict(p, xyz=p["xyz"] + eps * 1e-9)
        g = jax.grad(lambda q: prep_loss(q, deg))(p)
        return p["xyz"] + g["xyz"] * 1e-9

    bench("prep_fwdbwd_deg3_ms", lambda p, e: prep_fwdbwd(p, 3, e), params)
    bench("prep_fwdbwd_deg0_ms", lambda p, e: prep_fwdbwd(p, 0, e), params)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
