"""Bisect the in-context cost of bin_gaussians' expansion pipeline.

Builds the REAL expansion graph (same shapes/ops as ops/binning.py) but cut
at successive points; each prefix is one jitted program, chained on depths
so nothing memoizes. The successive differences attribute the 21 ms.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_expand_bisect.py
"""

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
    from pcp_tpu.ops import binning
    from pcp_tpu.ops.projection import TILE, CameraIntrin, preprocess

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
    num_tiles = tiles_x * tiles_y
    max_pairs = 16 * CAPACITY

    scales = G.scaling_act(params["scaling"])
    opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
    sh = G.sh_coeffs(params)
    prep = preprocess(params["xyz"], scales, params["rotation"], opac, sh,
                      viewmat, intrin, (W, H), 3)
    rect0 = prep["rect"]
    depths0 = prep["depths"]

    tile_bits = binning._ceil_log2(num_tiles + 1)
    depth_bits = 32 - tile_bits
    n = CAPACITY

    def prefix(stage):
        def f(rect, depths):
            wx = rect[:, 2] - rect[:, 0]
            wy = rect[:, 3] - rect[:, 1]
            counts = (wx * wy).astype(jnp.int32)
            dq = (jax.lax.bitcast_convert_type(
                depths.astype(jnp.float32), jnp.uint32)
                >> jnp.uint32(32 - depth_bits))
            if stage == "counts":
                return counts.sum() + dq.sum()
            perm = jnp.argsort(
                jnp.where(counts > 0, dq, jnp.uint32(0xFFFFFFFF))
            ).astype(jnp.int32)
            if stage == "argsort":
                return perm.sum()
            counts_p = counts[perm]
            offsets_p = jnp.cumsum(counts_p) - counts_p
            total = offsets_p[-1] + counts_p[-1]
            if stage == "offsets":
                return total + offsets_p.sum()
            pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
            span_start = jnp.where(counts_p > 0, offsets_p, max_pairs)
            seed = (jnp.zeros((max_pairs,), jnp.int32)
                    .at[span_start]
                    .max(jnp.arange(n, dtype=jnp.int32), mode="drop"))
            if stage == "seed":
                return seed.sum() + total
            gid = jax.lax.cummax(seed)
            if stage == "cummax":
                return gid.sum() + total
            rect_p = rect[perm]
            pack = jnp.stack(
                [rect_p[:, 0], rect_p[:, 1], wx[perm], offsets_p,
                 dq[perm].astype(jnp.int32), perm], axis=1)
            g = pack[gid]
            if stage == "gather":
                return g.sum() + total
            local = pair_idx - g[:, 3]
            valid = pair_idx < total
            gwf = jnp.maximum(g[:, 2], 1).astype(jnp.float32)
            tyl = jnp.floor(
                (local.astype(jnp.float32) + 0.5) / gwf).astype(jnp.int32)
            txl = local - tyl * g[:, 2]
            tile_id = ((g[:, 1] + tyl) * tiles_x + g[:, 0] + txl
                       ).astype(jnp.uint32)
            tile_id = jnp.where(valid, tile_id, jnp.uint32(num_tiles))
            if stage == "tileid":
                return tile_id.astype(jnp.int32).sum() + total
            key = (tile_id << jnp.uint32(depth_bits)) | jnp.where(
                valid, g[:, 4].astype(jnp.uint32), jnp.uint32(0))
            s_key, s_gid = jax.lax.sort((key, g[:, 5]), num_keys=1,
                                        is_stable=False)
            if stage == "sort":
                return s_key.astype(jnp.int32).sum() + s_gid.sum()
            raise ValueError(stage)

        return jax.jit(f)

    results = {}
    for stage in ["counts", "argsort", "offsets", "seed", "cummax",
                  "gather", "tileid", "sort"]:
        f = prefix(stage)
        d = depths0
        o = f(rect0, d)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for i in range(ITERS):
            d = d + 1e-6
            o = f(rect0, d)
        jax.block_until_ready(o)
        results[stage] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
