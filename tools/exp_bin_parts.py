"""In-context binning bisection: expansion vs sort vs table build.

Chained variants (each includes live preprocess so inputs vary):
- prep_only:        baseline
- prep_expand:      + class expansion (keys/payloads, no sort)
- prep_expand_sort: + lax.sort
- prep_full_bin:    + searchsorted + (nt, K) table gather  (= bin_gaussians)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_bin_parts.py [K]
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
    from pcp_tpu.ops import binning as B
    from pcp_tpu.ops.projection import TILE, preprocess
    from tools.bench_scene import CAPACITY, H, W, camera, make_scene

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rng = np.random.default_rng(0)
    params, alive = make_scene(rng)
    viewmat, intrin = camera()
    tiles_x = (W + TILE - 1) // TILE
    tiles_y = (H + TILE - 1) // TILE
    num_tiles = tiles_x * tiles_y
    opac0 = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
    results = {"max_per_tile": k}

    def prep_of(p, eps):
        return preprocess(
            p["xyz"] + eps * 1e-9, G.scaling_act(p["scaling"]),
            p["rotation"], opac0, G.sh_coeffs(p), viewmat, intrin, (W, H), 3,
        )

    def expand(pr):
        """Mirror bin_gaussians_v2 up to (keys, pays) concat."""
        rect, depths = pr["rect"], pr["depths"]
        n = rect.shape[0]
        tile_bits = B._ceil_log2(num_tiles + 1)
        depth_bits = 32 - tile_bits
        cap_b = max(n // B.CAPB_DIV, 32)
        cap_c = max(n // B.CAPC_DIV, 16)
        cap_d = max(n // B.CAPD_DIV, 8)
        x0, y0 = rect[:, 0], rect[:, 1]
        wx = rect[:, 2] - rect[:, 0]
        wy = rect[:, 3] - rect[:, 1]
        counts = (wx * wy).astype(jnp.int32)
        dq = (jax.lax.bitcast_convert_type(
            depths.astype(jnp.float32), jnp.uint32)
            >> jnp.uint32(32 - depth_bits))
        counts_a = jnp.where(counts <= B.R1, counts, 0)
        gid_all = jnp.arange(n, dtype=jnp.int32)
        key_a, pay_a = B._expand_rows(x0, y0, wx, dq, gid_all, counts_a,
                                      B.R1, tiles_x, depth_bits)

        def table(mask, cap, r):
            idx, rank = B._compact_class(mask, cap, n)
            ok = idx >= 0
            src = jnp.maximum(idx, 0)
            cnt = jnp.where(ok, jnp.minimum(counts[src], r), 0)
            return B._expand_rows(x0[src], y0[src], wx[src], dq[src], src,
                                  cnt, r, tiles_x, depth_bits)

        key_b, pay_b = table((counts > B.R1) & (counts <= B.R2), cap_b, B.R2)
        key_c, pay_c = table((counts > B.R2) & (counts <= B.R3), cap_c, B.R3)
        key_d, pay_d = table(counts > B.R3, cap_d, num_tiles)
        keys = jnp.concatenate([key_a, key_b, key_c, key_d])
        pays = jnp.concatenate([pay_a, pay_b, pay_c, pay_d])
        return keys, pays

    @jax.jit
    def prep_only(p, eps):
        pr = prep_of(p, eps)
        return jnp.sum(pr["rect"]) + jnp.sum(pr["depths"])

    @jax.jit
    def prep_expand(p, eps):
        pr = prep_of(p, eps)
        keys, pays = expand(pr)
        return jnp.sum(keys) + jnp.sum(pays)

    @jax.jit
    def prep_expand_sort(p, eps):
        pr = prep_of(p, eps)
        keys, pays = expand(pr)
        s_key, s_gid = jax.lax.sort((keys, pays), num_keys=1, is_stable=False)
        return jnp.sum(s_key) + jnp.sum(s_gid)

    @jax.jit
    def prep_full_bin(p, eps):
        pr = prep_of(p, eps)
        bins = B.bin_gaussians(pr["rect"], pr["depths"], tiles_x, tiles_y,
                               16 * CAPACITY, k)
        return jnp.sum(bins.tile_gauss) + jnp.sum(bins.tile_count)

    for name, f in [("prep_only_ms", prep_only),
                    ("prep_expand_ms", prep_expand),
                    ("prep_expand_sort_ms", prep_expand_sort),
                    ("prep_full_bin_ms", prep_full_bin)]:
        o = f(params, jnp.float32(0))
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for i in range(ITERS):
            o = f(params, jnp.float32(i + 1))
        jax.block_until_ready(o)
        results[name] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
