"""Dump the compiled HLO of the bench train step (to map profiler op
names -> source ops). Writes /tmp/train_step_hlo.txt.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dump_hlo.py [K]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    from pcp_tpu.train.step import _cached_train_step, _ocfg_key
    cached = _cached_train_step(_ocfg_key(ocfg), (W, H), True)
    lowered = cached.lower(state, viewmat, intrin, gt, jnp.int32(0),
                           background, jnp.float32(30.0), 3)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = "/tmp/train_step_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out}: {len(txt)} chars")


if __name__ == "__main__":
    main()
