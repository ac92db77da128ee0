"""In-context step bisection: fwd-only vs fwd+bwd, L1-only vs +SSIM.

All variants chain state (params perturbed every iter) so the axon
memoizer can't fake the numbers; differences between variants are the
only trusted read (PERF_NOTES "benchmarking discipline").

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_step_parts.py [K]
"""

from __future__ import annotations

import functools
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
    from pcp_tpu.train.step import render_gaussians
    from pcp_tpu.utils.loss import l1_loss, ssim
    from tools.bench_scene import CAPACITY, H, W, camera, make_scene

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    rng = np.random.default_rng(0)
    params, alive = make_scene(rng)
    viewmat, intrin = camera()
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    background = jnp.zeros(3)

    def loss_of(p, use_ssim):
        img, aux = render_gaussians(
            p, alive, viewmat, intrin, (W, H), background, 3,
            max_per_tile=k, max_pairs=16 * CAPACITY,
        )
        loss = 0.8 * l1_loss(img, gt)
        if use_ssim:
            chw = lambda x: jnp.transpose(x, (2, 0, 1))
            loss = loss + 0.2 * (1.0 - ssim(chw(img), chw(gt)))
        return loss

    @functools.partial(jax.jit, static_argnames=("grad", "use_ssim"))
    def step(p, eps, grad, use_ssim):
        # perturb -> state chains; returns updated params so the next call
        # depends on this one
        p = {kk: v + eps * 1e-9 for kk, v in p.items()}
        if grad:
            g = jax.grad(lambda q: loss_of(q, use_ssim))(p)
            p = {kk: v - 0.0 * g[kk] + 1e-9 for kk, v in p.items()}
        else:
            l = loss_of(p, use_ssim)
            p = {kk: v + l * 1e-12 for kk, v in p.items()}
        return p

    results = {"max_per_tile": k,
               "tight_rect": os.environ.get("PCP_TIGHT_RECT", "1")}

    for name, grad, use_ssim in [
        ("fwd_l1", False, False),
        ("fwd_l1_ssim", False, True),
        ("fwdbwd_l1", True, False),
        ("fwdbwd_l1_ssim", True, True),
    ]:
        p = dict(params)
        for i in range(3):
            p = step(p, jnp.float32(i), grad, use_ssim)
        jax.block_until_ready(p["xyz"])
        t0 = time.perf_counter()
        for i in range(ITERS):
            p = step(p, jnp.float32(i), grad, use_ssim)
        jax.block_until_ready(p["xyz"])
        results[name + "_ms"] = round(
            (time.perf_counter() - t0) / ITERS * 1e3, 2)

    # pair stats under the current rect policy
    from pcp_tpu.ops.projection import preprocess
    opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
    prep = jax.jit(lambda: preprocess(
        params["xyz"], G.scaling_act(params["scaling"]), params["rotation"],
        opac, G.sh_coeffs(params), viewmat, intrin, (W, H), 3))()
    rect = np.asarray(prep["rect"])
    cts = (rect[:, 2] - rect[:, 0]) * (rect[:, 3] - rect[:, 1])
    results["n_pairs"] = int(cts.sum())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
