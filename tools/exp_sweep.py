"""A/B sweep of full train-step time over kernel config toggles.

Configs: (USE_MXU_SCANS, FORCE_PAIR_SORT) in {T,F} x {T,F}.
The jitted step caches on config via a sweep-key baked into OptimConfig?
No — flags are read at trace time, so each config needs a fresh trace:
we bust the lru cache by varying max_per_tile by +0 (same) ... instead we
clear the step cache between configs.
"""

from __future__ import annotations

import json
import time

import numpy as np

W, H = 800, 600
CAPACITY = 1 << 17
N_POINTS = 100_000
ITERS = 15


def main():
    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.ops import binning, pallas_composite as pc
    from pcp_tpu.ops.projection import CameraIntrin
    from pcp_tpu.train import optim, step as step_mod
    from pcp_tpu.train.config import OptimConfig
    from pcp_tpu.train.step import TrainState, make_train_step

    rng = np.random.default_rng(0)
    xyz = np.stack(
        [rng.uniform(-20, 20, N_POINTS), rng.uniform(-20, 20, N_POINTS),
         rng.uniform(2, 60, N_POINTS)], -1,
    ).astype(np.float32)
    rgb = rng.uniform(0, 1, (N_POINTS, 3)).astype(np.float32)
    gcfg = G.GaussianConfig(sh_degree=3, capacity=CAPACITY)
    params, alive = G.create_from_pcd(xyz, rgb, gcfg)
    app = init_appearance(jax.random.PRNGKey(0), (W, H))
    viewmat = jnp.eye(4)
    intrin = CameraIntrin(fx=jnp.float32(700.0), fy=jnp.float32(700.0),
                          cx=jnp.float32(W / 2), cy=jnp.float32(H / 2))
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    background = jnp.zeros(3)
    ocfg = OptimConfig(capacity=CAPACITY, max_per_tile=512,
                       pairs_per_gaussian=16)

    results = {}
    for mxu in (False, True):
        for pairsort in (False, True):
            pc.USE_MXU_SCANS = mxu
            binning.FORCE_PAIR_SORT = pairsort
            step_mod._cached_train_step.cache_clear()
            state = TrainState(
                params=params, app=app, opt_g=optim.init_adam(params),
                opt_a=optim.init_adam(app), alive=alive,
                stats=G.init_densify_stats(CAPACITY),
            )
            step = make_train_step(ocfg, (W, H), 30.0, use_appearance=True)
            for _ in range(3):
                state, m = step(state, viewmat, intrin, gt, jnp.int32(0),
                                background, 3)
            jax.block_until_ready(state.params["xyz"])
            t0 = time.perf_counter()
            for _ in range(ITERS):
                state, m = step(state, viewmat, intrin, gt, jnp.int32(0),
                                background, 3)
            jax.block_until_ready(state.params["xyz"])
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            key = f"mxu={int(mxu)}_pairsort={int(pairsort)}"
            results[key] = round(ms, 2)
            print(json.dumps({key: results[key]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
