"""Benchmark: per-block training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's hot path (train.py:94-157) — full differentiable
render (preprocess -> binning -> tile compositing), appearance decoupling,
0.8*L1 + 0.2*(1-SSIM), backward, Adam — on a realistic single block:
~100k live Gaussians (131k capacity), 800x600 render.

Baseline: the reference publishes no numbers (BASELINE.md); vanilla Inria
3DGS trains 30k iterations in roughly 25 minutes on a 24 GB-class CUDA GPU
at comparable scene scale, i.e. ~20 iters/s. vs_baseline is measured
iters/s / 20.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 20.0
W, H = 800, 600
CAPACITY = 1 << 17
N_POINTS = 100_000
WARMUP = 3
ITERS = 30


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.ops.projection import CameraIntrin
    from pcp_tpu.train import optim
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
    state = TrainState(
        params=params, app=app, opt_g=optim.init_adam(params),
        opt_a=optim.init_adam(app), alive=alive,
        stats=G.init_densify_stats(CAPACITY),
    )

    ocfg = OptimConfig(capacity=CAPACITY, max_per_tile=512, pairs_per_gaussian=16)
    step = make_train_step(ocfg, (W, H), 30.0, use_appearance=True)

    viewmat = jnp.eye(4)
    intrin = CameraIntrin(
        fx=jnp.float32(700.0), fy=jnp.float32(700.0),
        cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
    )
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    background = jnp.zeros(3)

    for _ in range(WARMUP):
        state, metrics = step(state, viewmat, intrin, gt, jnp.int32(0),
                              background, 3)
    jax.block_until_ready(state.params["xyz"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, viewmat, intrin, gt, jnp.int32(0),
                              background, 3)
    jax.block_until_ready(state.params["xyz"])
    dt = time.perf_counter() - t0

    iters_per_sec = ITERS / dt

    # Optional per-stage breakdown (preprocess/binning/fwd/fwd+bwd — the
    # knobs that steer optimization): set PCP_BENCH_BREAKDOWN=1. Kept off by
    # default so the driver-run bench stays fast; tools/profile_stages.py is
    # the standalone equivalent.
    import os
    if os.environ.get("PCP_BENCH_BREAKDOWN"):
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "tools",
                          "profile_stages.py")],
            capture_output=True, text=True, timeout=900,
        )
        for ln in out.stdout.splitlines():
            if ln.startswith("{"):
                print(json.dumps({"breakdown": json.loads(ln)}))

    print(json.dumps({
        "metric": "train_iters_per_sec_100k_gauss_800x600",
        "value": round(iters_per_sec, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
