"""Composite fwd+bwd timing with PP (backward pixel-slice) variants."""

from __future__ import annotations

import json
import time

import numpy as np

W, H = 800, 600
CAPACITY = 1 << 17
N_POINTS = 100_000
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.ops import pallas_composite as pc
    from pcp_tpu.ops.binning import bin_gaussians
    from pcp_tpu.ops.projection import TILE, CameraIntrin, preprocess
    from pcp_tpu.ops.rasterize import composite_fused

    rng = np.random.default_rng(0)
    xyz = np.stack(
        [rng.uniform(-20, 20, N_POINTS), rng.uniform(-20, 20, N_POINTS),
         rng.uniform(2, 60, N_POINTS)], -1,
    ).astype(np.float32)
    rgb = rng.uniform(0, 1, (N_POINTS, 3)).astype(np.float32)
    params, alive = G.create_from_pcd(
        xyz, rgb, G.GaussianConfig(sh_degree=3, capacity=CAPACITY))
    viewmat = jnp.eye(4)
    intrin = CameraIntrin(fx=jnp.float32(700.0), fy=jnp.float32(700.0),
                          cx=jnp.float32(W / 2), cy=jnp.float32(H / 2))
    tiles_x = (W + TILE - 1) // TILE
    tiles_y = (H + TILE - 1) // TILE
    scales = G.scaling_act(params["scaling"])
    opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
    sh = G.sh_coeffs(params)
    prep = preprocess(params["xyz"], scales, params["rotation"], opac, sh,
                      viewmat, intrin, (W, H), 3)
    bins = bin_gaussians(prep["rect"], prep["depths"], tiles_x, tiles_y,
                         max_pairs=16 * CAPACITY, max_per_tile=512)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    bg = jnp.zeros(3)
    results = {}

    def measure(tag):
        @jax.jit
        def fb(means2d):
            def loss(m2d):
                p = dict(prep)
                p["means2d"] = m2d
                img, _ = composite_fused(p, bins, (W, H), bg)
                return jnp.mean(jnp.abs(img - gt))
            l, g = jax.value_and_grad(loss)(means2d)
            return means2d - 0.0 * g, l, g

        m = prep["means2d"]
        o = fb(m)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for i in range(ITERS):
            m, l, g = fb(m + 1e-6)
        jax.block_until_ready(m)
        results[tag] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)
        return np.asarray(g)

    g128 = measure("fwd_bwd_pp128")
    pc.PP = 256
    try:
        g256 = measure("fwd_bwd_pp256")
        results["grad_match"] = bool(
            np.allclose(g128, g256, rtol=1e-4, atol=1e-6))
    except Exception as e:
        results["fwd_bwd_pp256"] = f"error: {type(e).__name__}: {e}"[:200]
    finally:
        pc.PP = 128
    print(json.dumps(results))


if __name__ == "__main__":
    main()
