"""Op-level HLO profile of the full train step on the real chip.

Captures a jax.profiler trace of chained train steps and prints the top
HLO ops by self time (via tensorboard_plugin_profile's framework_op_stats
converter). This attributes in-context time to actual fused XLA ops —
unlike stage isolation, which distorts fusion (see PERF_NOTES).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_ops.py [K]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 12
TOP = 40


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.train import optim
    from pcp_tpu.train.config import OptimConfig
    from pcp_tpu.train.step import TrainState, make_train_step
    from tools import bench_scene
    from tools.bench_scene import MAX_PER_TILE

    ap = argparse.ArgumentParser()
    ap.add_argument("k_pos", nargs="?", type=int, default=MAX_PER_TILE)
    ap.add_argument("--n", type=int, default=0, help="live points (0=bench)")
    ap.add_argument("--cap", type=int, default=0, help="log2 capacity")
    ap.add_argument("--k_lo", type=int, default=0)
    ap.add_argument("--t_hi", type=int, default=0)
    ap.add_argument("--levels", default="")
    ap.add_argument("--active_cap", type=int, default=0)
    ap.add_argument("--pair_levels", default="")
    ap.add_argument("--w", type=int, default=0)
    ap.add_argument("--h", type=int, default=0)
    args = ap.parse_args()

    max_per_tile = args.k_pos
    if args.w:
        bench_scene.W, bench_scene.H = args.w, args.h
        bench_scene.FX = bench_scene.FY = 850.0
    W, H = bench_scene.W, bench_scene.H
    CAPACITY = (1 << args.cap) if args.cap else bench_scene.CAPACITY

    rng = np.random.default_rng(0)
    mk = dict(n_points=args.n, capacity=CAPACITY) if args.n else {}
    params, alive = bench_scene.make_scene(rng, **mk)
    viewmat, intrin = bench_scene.camera()
    app = init_appearance(jax.random.PRNGKey(0), (W, H))
    state = TrainState(
        params=params, app=app, opt_g=optim.init_adam(params),
        opt_a=optim.init_adam(app), alive=alive,
        stats=G.init_densify_stats(CAPACITY),
    )
    ocfg = OptimConfig(capacity=CAPACITY, max_per_tile=max_per_tile,
                       tile_k_lo=args.k_lo, tile_hi_cap=args.t_hi,
                       tile_levels=args.levels, active_cap=args.active_cap,
                       pair_levels=args.pair_levels,
                       pairs_per_gaussian=16)
    step = make_train_step(ocfg, (W, H), 30.0, use_appearance=True)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    background = jnp.zeros(3)

    for _ in range(3):
        state, m = step(state, viewmat, intrin, gt, jnp.int32(0),
                        background, 3)
    jax.block_until_ready(state.params["xyz"])

    logdir = "/tmp/pcp_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(ITERS):
            state, m = step(state, viewmat, intrin, gt, jnp.int32(0),
                            background, 3)
        jax.block_until_ready(state.params["xyz"])

    xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert xs, f"no xplane under {logdir}"
    # Parse the xplane directly (TF's tbp converter is version-broken in
    # this image); aggregate per-op durations on device planes. Device
    # XLines carry one XEvent per executed HLO op instance.
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    agg = {}
    for path in xs:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if not ("TPU" in plane.name or "/device:" in plane.name
                    or "Device" in plane.name or "axon" in plane.name.lower()):
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    md = ev_meta.get(ev.metadata_id)
                    name = md.display_name or md.name if md else "?"
                    dur = ev.duration_ps / 1e9  # -> ms
                    e = agg.setdefault((plane.name, line.name, name), [0, 0.0])
                    e[0] += 1
                    e[1] += dur
    if not agg:
        print("planes found:")
        for path in xs:
            space = xplane_pb2.XSpace()
            with open(path, "rb") as f:
                space.ParseFromString(f.read())
            for plane in space.planes:
                print(" ", plane.name,
                      [ln.name for ln in plane.lines][:8])
        return
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    tot = sum(v[1] for v in agg.values())
    print(f"total event ms {tot:.1f} over {ITERS} iters "
          f"(lines overlap; read per-line)")
    for (pn, ln, name), (occ, ms) in rows[:TOP]:
        print(f"{ms / ITERS:8.3f} ms/it x{occ:<5} [{ln[:18]:18}] {name[:84]}")


if __name__ == "__main__":
    main()
