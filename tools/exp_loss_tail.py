"""In-context cost of the loss tail: full train step with appearance
ON vs OFF (chained state, the only trustworthy methodology — see
PERF_NOTES "benchmarking discipline").

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_loss_tail.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30


def run(use_appearance: bool, max_per_tile: int):
    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.train import optim
    from pcp_tpu.train.config import OptimConfig
    from pcp_tpu.train.step import TrainState, make_train_step
    from tools.bench_scene import CAPACITY, H, W, camera, make_scene

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
    step = make_train_step(ocfg, (W, H), 30.0, use_appearance=use_appearance)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    background = jnp.zeros(3)
    for _ in range(3):
        state, m = step(state, viewmat, intrin, gt, jnp.int32(0),
                        background, 3)
    jax.block_until_ready(state.params["xyz"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, viewmat, intrin, gt, jnp.int32(0),
                        background, 3)
    jax.block_until_ready(state.params["xyz"])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    on = run(True, k)
    off = run(False, k)
    print(json.dumps({
        "app_on_ms": round(on, 2),
        "app_off_ms": round(off, 2),
        "appearance_in_context_ms": round(on - off, 2),
        "max_per_tile": k,
    }))


if __name__ == "__main__":
    main()
