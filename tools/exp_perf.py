"""Micro-experiments for the binning + composite hot path on the TPU.

Each experiment times one candidate implementation; run, compare, fold the
winners back into pcp_tpu/ops. Chains inputs to defeat memoization.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

W, H = 800, 600
CAPACITY = 1 << 17
N_POINTS = 100_000
MAX_PAIRS = 16 * CAPACITY
MAX_PER_TILE = 512
ITERS = 10

results = {}


def bench(name, f, *args):
    import jax

    import jax.numpy as jnp

    def nudge(a, i):
        if jnp.issubdtype(a.dtype, jnp.floating):
            return a + 1e-7 * (i + 1)
        # +k preserves sortedness and defeats execution memoization
        return a + jnp.asarray(i + 1, a.dtype)

    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(ITERS):
        o = f(*[nudge(a, i) if j == 0 else a for j, a in enumerate(args)])
    jax.block_until_ready(o)
    results[name] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)


def main():
    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
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
    scales = G.scaling_act(params["scaling"])
    opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
    sh = G.sh_coeffs(params)
    prep = preprocess(params["xyz"], scales, params["rotation"], opac, sh,
                      viewmat, intrin, (W, H), 3)
    rect = jax.device_get(prep["rect"])
    depths0 = prep["depths"]

    n = CAPACITY
    wx = rect[:, 2] - rect[:, 0]
    counts_np = (wx * (rect[:, 3] - rect[:, 1])).astype(np.int32)
    rect_j = jnp.asarray(rect)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    # ---- expansion sub-pieces ----
    if which in ("all", "expand"):
        @jax.jit
        def scatter_only(depths):
            counts = jnp.asarray(counts_np) + (depths[:n] * 0).astype(jnp.int32)
            offsets = jnp.cumsum(counts) - counts
            span_start = jnp.where(counts > 0, offsets, MAX_PAIRS)
            seed = (jnp.zeros((MAX_PAIRS,), jnp.int32)
                    .at[span_start].max(jnp.arange(n, dtype=jnp.int32),
                                        mode="drop"))
            return seed

        @jax.jit
        def scatter_cummax(depths):
            seed = scatter_only(depths)
            return jax.lax.cummax(seed)

        @jax.jit
        def cumsum_131k(depths):
            counts = jnp.asarray(counts_np) + (depths[:n] * 0).astype(jnp.int32)
            return jnp.cumsum(counts)

        @jax.jit
        def argsort_131k(depths):
            return jnp.argsort(
                jax.lax.bitcast_convert_type(depths, jnp.uint32))

        @jax.jit
        def gather_2m_6(depths):
            gid = scatter_cummax(depths)
            pack = jnp.stack([rect_j[:, 0], rect_j[:, 1], rect_j[:, 2],
                              rect_j[:, 3],
                              (depths * 0).astype(jnp.int32),
                              jnp.arange(n, dtype=jnp.int32)], axis=1)
            return pack[gid]

        bench("cumsum_131k", cumsum_131k, depths0)
        bench("argsort_131k", argsort_131k, depths0)
        bench("scatter_only", scatter_only, depths0)
        bench("scatter_cummax", scatter_cummax, depths0)
        bench("plus_gather_2m_x6", gather_2m_6, depths0)

    # ---- sort variants ----
    if which in ("all", "sort"):
        key0 = jnp.asarray(
            rng.integers(0, 2**31, MAX_PAIRS, dtype=np.int64).astype(np.uint32))
        gid0 = jnp.arange(MAX_PAIRS, dtype=jnp.int32)

        @jax.jit
        def sort_pair(key):
            return jax.lax.sort((key, gid0), num_keys=1, is_stable=False)

        @jax.jit
        def sort_single_u64_trick(key):
            packed = (key.astype(jnp.uint64) << jnp.uint64(21)) | \
                gid0.astype(jnp.uint64)
            s = jax.lax.sort(packed, is_stable=False)
            return s >> jnp.uint64(21), (s & jnp.uint64((1 << 21) - 1))

        bench("sort_u32key_i32payload", sort_pair, key0)
        try:
            bench("sort_u64_packed", sort_single_u64_trick, key0)
        except Exception as e:
            results["sort_u64_packed"] = f"error {type(e).__name__}"

    # ---- slot-within-tile variants ----
    if which in ("all", "slot"):
        s_tile0 = jnp.sort(jnp.asarray(
            rng.integers(0, num_tiles, MAX_PAIRS).astype(np.int32)))
        pair_idx = jnp.arange(MAX_PAIRS, dtype=jnp.int32)

        @jax.jit
        def slot_cummax(s_tile):
            is_boundary = jnp.concatenate(
                [jnp.ones((1,), bool), s_tile[1:] != s_tile[:-1]])
            seg_start = jax.lax.cummax(jnp.where(is_boundary, pair_idx, 0))
            return pair_idx - seg_start

        @jax.jit
        def slot_searchsorted_gather(s_tile):
            tr = jnp.arange(num_tiles, dtype=jnp.int32)
            starts = jnp.searchsorted(s_tile, tr, side="left").astype(jnp.int32)
            return pair_idx - starts[jnp.clip(s_tile, 0, num_tiles - 1)]

        bench("slot_cummax", slot_cummax, s_tile0)
        bench("slot_searchsorted_gather", slot_searchsorted_gather, s_tile0)

    # ---- loss-side pieces ----
    if which in ("all", "loss"):
        from pcp_tpu.models.appearance import (
            decouple_appearance,
            init_appearance,
        )
        from pcp_tpu.utils.loss import l1_loss, ssim

        app = init_appearance(jax.random.PRNGKey(0), (W, H))
        img0 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
        gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

        @jax.jit
        def app_fwd_bwd(img):
            def f(img, app):
                d, _ = decouple_appearance(img, app, jnp.int32(0))
                return l1_loss(d, gt)
            l, g = jax.value_and_grad(f, argnums=(0, 1))(img, app)
            return g[0]

        @jax.jit
        def ssim_fwd_bwd(img):
            def f(img):
                chw = lambda x: jnp.transpose(x, (2, 0, 1))
                return 1.0 - ssim(chw(img), chw(gt))
            return jax.grad(f)(img)

        from pcp_tpu.train import optim
        opt = optim.init_adam(params)
        lrs = {k: 1e-3 for k in params}

        @jax.jit
        def adam(x):
            g = {k: v * 0 + 1e-6 for k, v in params.items()}
            g["xyz"] = g["xyz"] + x[:, :3] * 0
            p2, o2 = optim.adam_step(params, g, opt, lrs)
            return p2["xyz"]

        bench("appearance_fwd_bwd", app_fwd_bwd, img0)
        bench("ssim_fwd_bwd", ssim_fwd_bwd, img0)
        bench("adam_full", adam, params["xyz"])

    print(json.dumps(results))


if __name__ == "__main__":
    main()
