"""Timeline of XLA ops within one train step on the real chip.

Prints the "XLA Ops" line events of the LAST traced step in start-time
order, with durations and inter-op gaps — the view that exposes the
critical path (op self-times alone hide DMA stalls).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python tools/profile_timeline.py [K]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 6
MIN_MS = 0.08


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.train import optim
    from pcp_tpu.train.config import OptimConfig
    from tools import bench_scene
    from pcp_tpu.train.step import TrainState, make_train_step

    ap = argparse.ArgumentParser()
    ap.add_argument("k", nargs="?", type=int, default=bench_scene.MAX_PER_TILE)
    ap.add_argument("--n", type=int, default=0,
                    help="scale-point mode: live points (e.g. 719802)")
    ap.add_argument("--cap", type=int, default=0, help="log2 capacity")
    ap.add_argument("--k_lo", type=int, default=0)
    ap.add_argument("--levels", default="")
    ap.add_argument("--active_cap", type=int, default=0)
    ap.add_argument("--pair_levels", default="")
    ap.add_argument("--w", type=int, default=0)
    ap.add_argument("--h", type=int, default=0)
    args = ap.parse_args()
    max_per_tile = args.k

    if args.w:
        bench_scene.W = args.w
    if args.h:
        bench_scene.H = args.h
    W, H = bench_scene.W, bench_scene.H
    CAPACITY = (1 << args.cap) if args.cap else bench_scene.CAPACITY

    rng = np.random.default_rng(0)
    params, alive = bench_scene.make_scene(
        rng, n_points=args.n or None, capacity=CAPACITY)
    viewmat, intrin = bench_scene.camera()
    app = init_appearance(jax.random.PRNGKey(0), (W, H))
    state = TrainState(
        params=params, app=app, opt_g=optim.init_adam(params),
        opt_a=optim.init_adam(app), alive=alive,
        stats=G.init_densify_stats(CAPACITY),
    )
    ocfg = OptimConfig(capacity=CAPACITY, max_per_tile=max_per_tile,
                       tile_k_lo=args.k_lo, tile_levels=args.levels,
                       active_cap=args.active_cap,
                       pair_levels=args.pair_levels,
                       pairs_per_gaussian=16)
    step = make_train_step(ocfg, (W, H), 30.0, use_appearance=True)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    background = jnp.zeros(3)

    for _ in range(3):
        state, m = step(state, viewmat, intrin, gt, jnp.int32(0),
                        background, 3)
    jax.block_until_ready(state.params["xyz"])

    logdir = "/tmp/pcp_trace_tl"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(ITERS):
            state, m = step(state, viewmat, intrin, gt, jnp.int32(0),
                            background, 3)
        jax.block_until_ready(state.params["xyz"])

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    evs = []
    for path in glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True):
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            md = plane.event_metadata
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    m_ = md.get(ev.metadata_id)
                    name = (m_.display_name or m_.name) if m_ else "?"
                    t0 = line.timestamp_ns + ev.offset_ps / 1e3
                    evs.append((t0, ev.duration_ps / 1e9, name))
    evs.sort()
    assert evs, "no XLA Ops events"
    # take the last ~1/ITERS of the span as "one step"
    span0, span1 = evs[0][0], evs[-1][0] + evs[-1][1] * 1e6
    cut = span1 - (span1 - span0) / ITERS * 1.05
    step_evs = [e for e in evs if e[0] >= cut]
    t_prev_end = None
    print(f"{len(step_evs)} ops in the last step window; showing "
          f">= {MIN_MS} ms ops and >= {MIN_MS} ms gaps")
    for t0, dur, name in step_evs:
        if t_prev_end is not None:
            gap = (t0 - t_prev_end) / 1e6
            if gap >= MIN_MS:
                print(f"    ................ gap {gap:7.3f} ms")
        if dur >= MIN_MS:
            print(f"  {dur:7.3f} ms  {name[:80]}")
        t_prev_end = max(t_prev_end or 0, t0 + dur * 1e6)

    print("\ntop ops by duration:")
    agg = {}
    for _, dur, name in step_evs:
        agg[name] = agg.get(name, 0.0) + dur
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur:8.3f} ms  {name[:90]}")
    print(f"  total: {sum(agg.values()):.1f} ms over {len(step_evs)} ops")


if __name__ == "__main__":
    main()
