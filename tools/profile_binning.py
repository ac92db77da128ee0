"""Sub-stage timing of bin_gaussians + composite on the real TPU."""

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
    num_tiles = tiles_x * tiles_y
    max_pairs = 16 * CAPACITY
    max_per_tile = 512

    scales = G.scaling_act(params["scaling"])
    opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
    sh = G.sh_coeffs(params)
    prep = preprocess(params["xyz"], scales, params["rotation"], opac, sh,
                      viewmat, intrin, (W, H), 3)
    rect = prep["rect"]
    depths = prep["depths"]
    results = {}

    def bench(name, fn, *args):
        f = jax.jit(fn)
        o = f(*args)
        jax.block_until_ready(o)
        # vary the depth input each call to defeat memoization
        t0 = time.perf_counter()
        for i in range(ITERS):
            o = f(*[a + (1e-7 * (i + 1)) if j == 1 else a
                    for j, a in enumerate(args)])
        jax.block_until_ready(o)
        results[name] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)

    tile_bits = binning._ceil_log2(num_tiles + 1)
    depth_bits = 32 - tile_bits

    def stage_expand(rect, depths):
        n = rect.shape[0]
        wx = rect[:, 2] - rect[:, 0]
        wy = rect[:, 3] - rect[:, 1]
        counts = (wx * wy).astype(jnp.int32)
        dq = (jax.lax.bitcast_convert_type(depths.astype(jnp.float32),
                                           jnp.uint32)
              >> jnp.uint32(32 - depth_bits))
        perm = jnp.argsort(
            jnp.where(counts > 0, dq, jnp.uint32(0xFFFFFFFF))).astype(jnp.int32)
        counts_p = counts[perm]
        offsets_p = jnp.cumsum(counts_p) - counts_p
        total = offsets_p[-1] + counts_p[-1]
        pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
        span_start = jnp.where(counts_p > 0, offsets_p, max_pairs)
        seed = (jnp.zeros((max_pairs,), jnp.int32)
                .at[span_start].max(jnp.arange(n, dtype=jnp.int32),
                                    mode="drop"))
        gid = jax.lax.cummax(seed)
        rect_p = rect[perm]
        pack = jnp.stack([rect_p[:, 0], rect_p[:, 1], wx[perm], offsets_p,
                          dq[perm].astype(jnp.int32), perm], axis=1)
        g = pack[gid]
        local = pair_idx - g[:, 3]
        valid = pair_idx < total
        gwf = jnp.maximum(g[:, 2], 1).astype(jnp.float32)
        tyl = jnp.floor((local.astype(jnp.float32) + 0.5) / gwf).astype(jnp.int32)
        txl = local - tyl * g[:, 2]
        tile_id = ((g[:, 1] + tyl) * tiles_x + g[:, 0] + txl).astype(jnp.uint32)
        tile_id = jnp.where(valid, tile_id, jnp.uint32(num_tiles))
        key = (tile_id << jnp.uint32(depth_bits)) | jnp.where(
            valid, g[:, 4].astype(jnp.uint32), jnp.uint32(0))
        return key, g[:, 5], total

    def stage_sort(rect, depths):
        key, pgid, total = stage_expand(rect, depths)
        s_key, s_gid = jax.lax.sort((key, pgid), num_keys=1, is_stable=False)
        return s_key, s_gid, total

    def stage_scatter(rect, depths):
        s_key, s_gid, total = stage_sort(rect, depths)
        s_tile = (s_key >> jnp.uint32(depth_bits)).astype(jnp.int32)
        pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
        is_boundary = jnp.concatenate(
            [jnp.ones((1,), bool), s_tile[1:] != s_tile[:-1]])
        seg_start = jax.lax.cummax(jnp.where(is_boundary, pair_idx, 0))
        slot = pair_idx - seg_start
        ok = (s_tile < num_tiles) & (slot < max_per_tile)
        flat_target = jnp.where(ok, s_tile * max_per_tile + slot,
                                num_tiles * max_per_tile)
        tile_gauss = (jnp.full((num_tiles * max_per_tile,), -1, jnp.int32)
                      .at[flat_target].set(s_gid, mode="drop")
                      .reshape(num_tiles, max_per_tile))
        return tile_gauss

    def stage_ranges(rect, depths):
        s_key, s_gid, total = stage_sort(rect, depths)
        s_tile = (s_key >> jnp.uint32(depth_bits)).astype(jnp.int32)
        tr = jnp.arange(num_tiles, dtype=jnp.int32)
        starts = jnp.searchsorted(s_tile, tr, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(s_tile, tr, side="right").astype(jnp.int32)
        return (ends - starts).max(), starts

    bench("expand_only", stage_expand, rect, depths)
    bench("expand_sort", stage_sort, rect, depths)
    bench("expand_sort_scatter", stage_scatter, rect, depths)
    bench("expand_sort_ranges", stage_ranges, rect, depths)

    def full_bin(rect, depths):
        b = binning.bin_gaussians(rect, depths, tiles_x, tiles_y,
                                  max_pairs=max_pairs,
                                  max_per_tile=max_per_tile)
        return b.tile_gauss

    def full_bin_all(rect, depths):
        b = binning.bin_gaussians(rect, depths, tiles_x, tiles_y,
                                  max_pairs=max_pairs,
                                  max_per_tile=max_per_tile)
        return b

    bench("full_bin_tilegauss_only", full_bin, rect, depths)
    bench("full_bin_all_outputs", full_bin_all, rect, depths)

    # composite fused fwd alone
    def comp(rect, depths):
        b = binning.bin_gaussians(rect, depths, tiles_x, tiles_y,
                                  max_pairs=max_pairs,
                                  max_per_tile=max_per_tile)
        img, t = composite_fused(prep, b, (W, H), jnp.zeros(3))
        return img

    bench("bin_plus_composite_fwd", comp, rect, depths)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
