"""Fast full-train-step timing on the canonical bench scene (chip).

Only the end-to-end step is trusted for optimization decisions (stage
isolation distorts fusion/lowering — see PERF_NOTES); this is bench.py
minus the breakdown subprocess, for quick A/B iterations.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/step_bench.py
Env A/B knobs pass through (PCP_BINNING, PCP_TB, PCP_MXU_SCANS, ...).
Optional argv[1] overrides max_per_tile.
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
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.train import optim
    from pcp_tpu.train.config import OptimConfig
    from pcp_tpu.train.step import TrainState, make_train_step
    from tools.bench_scene import CAPACITY, H, MAX_PER_TILE, W, camera, \
        make_scene

    max_per_tile = int(sys.argv[1]) if len(sys.argv) > 1 else MAX_PER_TILE
    rng = np.random.default_rng(0)
    params, alive = make_scene(rng)
    viewmat, intrin = camera()
    app = init_appearance(jax.random.PRNGKey(0), (W, H))
    state = TrainState(
        params=params, app=app, opt_g=optim.init_adam(params),
        opt_a=optim.init_adam(app), alive=alive,
        stats=G.init_densify_stats(CAPACITY),
    )
    ocfg = OptimConfig(capacity=CAPACITY, max_per_tile=max_per_tile,
                       pairs_per_gaussian=16)
    step = make_train_step(ocfg, (W, H), 30.0, use_appearance=True)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    background = jnp.zeros(3)

    m = None
    for _ in range(3):
        state, m = step(state, viewmat, intrin, gt, jnp.int32(0),
                        background, 3)
    jax.block_until_ready(state.params["xyz"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, viewmat, intrin, gt, jnp.int32(0),
                        background, 3)
    jax.block_until_ready(state.params["xyz"])
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({
        "step_ms": round(dt * 1e3, 2),
        "iters_per_sec": round(1.0 / dt, 2),
        "n_pairs": int(m["n_pairs"]),
        "max_tile_load": int(m["max_tile_load"]),
        "overflow": bool(m["overflow"]),
        "n_dropped": int(m.get("n_dropped", -1)),
        "tile_saturated": bool(m["tile_saturated"]),
        "max_per_tile": max_per_tile,
        "binning": os.environ.get("PCP_BINNING", "v2"),
    }))


if __name__ == "__main__":
    main()
