"""A/B: single-step dispatch loop vs fused lax.scan chunks on the bench
workload. Salted (time-derived gt noise) to defeat the axon cross-process
(executable, inputs) memoization described in PERF_NOTES.md."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.train import optim
    from pcp_tpu.train.config import OptimConfig
    from pcp_tpu.train.step import (
        TrainState,
        make_train_multistep,
        make_train_step,
    )
    from tools.bench_scene import CAPACITY, H, MAX_PER_TILE, W, camera, make_scene

    salt = (time.time_ns() % 1000) / 1e6
    rng = np.random.default_rng(0)
    params, alive = make_scene(rng)
    viewmat, intrin = camera()
    app = init_appearance(jax.random.PRNGKey(0), (W, H))

    def fresh_state():
        p = jax.tree_util.tree_map(jnp.array, params)
        a = jax.tree_util.tree_map(jnp.array, app)
        return TrainState(
            params=p, app=a, opt_g=optim.init_adam(p),
            opt_a=optim.init_adam(a), alive=jnp.array(alive),
            stats=G.init_densify_stats(CAPACITY),
        )

    ocfg = OptimConfig(capacity=CAPACITY, max_per_tile=MAX_PER_TILE,
                       pairs_per_gaussian=16)
    gt = jnp.asarray(
        (rng.uniform(0, 1, (H, W, 3)) + salt).astype(np.float32))
    bg = jnp.zeros(3)

    step = make_train_step(ocfg, (W, H), 30.0, use_appearance=True)
    N = 40

    st = fresh_state()
    for _ in range(5):
        st, m = step(st, viewmat, intrin, gt, jnp.int32(0), bg, 3)
    jax.block_until_ready(st.params["xyz"])
    t0 = time.perf_counter()
    for _ in range(N):
        st, m = step(st, viewmat, intrin, gt, jnp.int32(0), bg, 3)
    jax.block_until_ready(st.params["xyz"])
    dt1 = (time.perf_counter() - t0) / N * 1e3
    print(f"single-step: {dt1:.2f} ms/step ({1e3/dt1:.2f} it/s)")

    for fuse in (5, 10, 20):
        multi = make_train_multistep(ocfg, (W, H), 30.0, use_appearance=True)
        vms = jnp.stack([viewmat] * fuse)
        intrs = jax.tree_util.tree_map(lambda x: jnp.stack([x] * fuse), intrin)
        gts = jnp.stack([gt] * fuse)
        uids = jnp.zeros((fuse,), jnp.int32)
        st = fresh_state()
        st, m = multi(st, vms, intrs, gts, uids, bg, 3)
        jax.block_until_ready(st.params["xyz"])
        n_chunks = max(1, N // fuse)
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            st, m = multi(st, vms, intrs, gts, uids, bg, 3)
        jax.block_until_ready(st.params["xyz"])
        dt2 = (time.perf_counter() - t0) / (n_chunks * fuse) * 1e3
        print(f"fused x{fuse}:   {dt2:.2f} ms/step ({1e3/dt2:.2f} it/s)")


if __name__ == "__main__":
    main()
