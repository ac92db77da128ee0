"""Benchmark: per-block training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} with
honesty fields (`overflow`, `tile_saturated` must be false — the workload
fits every static capacity, so NO compositing work is dropped), the
scale-free `pairs_per_sec` secondary metric, and a per-stage `breakdown`.

Workload: the reference's hot path (train.py:94-157) — full differentiable
render (preprocess -> binning -> tile compositing), appearance decoupling,
0.8*L1 + 0.2*(1-SSIM), backward, Adam — on a realistic single block:
~100k live Gaussians (131k capacity), 800x600, trained-scene density
(tools/bench_scene.py; ~0.8M tile pairs/frame).

Baseline: the reference publishes no numbers (BASELINE.md); vanilla Inria
3DGS trains 30k iterations in roughly 25 minutes on a 24 GB-class CUDA GPU
at comparable scene scale, i.e. ~20 iters/s. vs_baseline is measured
iters/s / 20.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 20.0
WARMUP = 3
ITERS = 30


def main() -> None:
    # Per-stage breakdown FIRST, in its own process that runs to completion
    # BEFORE this process initializes the TPU client: two live TPU processes
    # contend on the one chip and inflate every number ~2x (round-2 verdict:
    # the committed breakdown claimed binning_ms > full_step_ms).
    breakdown = None
    if os.environ.get("PCP_BENCH_BREAKDOWN", "1") == "1":
        import subprocess
        import sys

        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "profile_stages.py")],
            capture_output=True, text=True, timeout=1800,
        )
        for ln in out.stdout.splitlines():
            if ln.startswith("{"):
                breakdown = json.loads(ln)

    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.train import optim
    from pcp_tpu.train.config import OptimConfig
    from pcp_tpu.train.step import TrainState, make_train_step
    from tools.bench_scene import (
        CAPACITY,
        H,
        MAX_PER_TILE,
        W,
        camera,
        make_scene,
    )

    rng = np.random.default_rng(0)
    params, alive = make_scene(rng)
    viewmat, intrin = camera()
    app = init_appearance(jax.random.PRNGKey(0), (W, H))
    state = TrainState(
        params=params, app=app, opt_g=optim.init_adam(params),
        opt_a=optim.init_adam(app), alive=alive,
        stats=G.init_densify_stats(CAPACITY),
    )

    ocfg = OptimConfig(capacity=CAPACITY, max_per_tile=MAX_PER_TILE,
                       pairs_per_gaussian=16)
    step = make_train_step(ocfg, (W, H), 30.0, use_appearance=True)

    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    background = jnp.zeros(3)

    metrics = None
    for _ in range(WARMUP):
        state, metrics = step(state, viewmat, intrin, gt, jnp.int32(0),
                              background, 3)
    jax.block_until_ready(state.params["xyz"])
    honesty = {
        "n_pairs": int(metrics["n_pairs"]),
        "max_tile_load": int(metrics["max_tile_load"]),
        "overflow": bool(metrics["overflow"]),
        "tile_saturated": bool(metrics["tile_saturated"]),
    }

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, viewmat, intrin, gt, jnp.int32(0),
                              background, 3)
    jax.block_until_ready(state.params["xyz"])
    dt = time.perf_counter() - t0

    iters_per_sec = ITERS / dt

    print(json.dumps({
        "metric": "train_iters_per_sec_100k_gauss_800x600",
        "value": round(iters_per_sec, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 3),
        "pairs_per_sec": round(honesty["n_pairs"] * iters_per_sec, 0),
        **honesty,
        "breakdown": breakdown,
    }))


if __name__ == "__main__":
    main()
