"""Batch-train all partition blocks — `python -m pcp_tpu.cli.auto_train
--base_path <model>/split_result/visible`.

Reference: auto_train.py:6-57 trains blocks *sequentially* as subprocesses on
one GPU. Here the default is the TPU fleet: every block trains
simultaneously via one shard_map over the device mesh (pcp_tpu.parallel);
`--sequential` falls back to per-block loops (e.g. for blocks whose camera
resolutions differ, or blocks exceeding per-chip HBM).

Writes per-block `{id}_point_cloud.ply` into each block's
output/point_cloud/iteration_<N>/ (PartitionScene naming,
scene/__init__.py:167) and a status manifest for elastic retry.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def find_blocks(base_path: str):
    """[(block_id, block_colmap_dir)] under split_result/visible
    (auto_train.py:22-34 walk)."""
    out = []
    for sub in sorted(os.listdir(base_path)):
        root = os.path.join(base_path, sub)
        if not os.path.isdir(root):
            continue
        for d in sorted(os.listdir(root)):
            if d.startswith("partition_") and os.path.isdir(os.path.join(root, d)):
                out.append((sub, os.path.join(root, d)))
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    from pcp_tpu.cli.common import (
        add_model_args,
        add_optim_args,
        add_pipeline_args,
        config_from_args,
    )

    p.add_argument("--base_path", required=True,
                   help="<model>/split_result/visible")
    p.add_argument("--sequential", action="store_true")
    p.add_argument("--intra_block", type=int, default=0, metavar="N",
                   help="train blocks one at a time, each sharded over an "
                        "N-device Gaussian-axis mesh (for blocks exceeding "
                        "one chip's HBM; parallel/intra_block.py)")
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--device_data", action="store_true",
                   help="keep per-block camera banks (incl. images) device-"
                        "resident; host sends only camera indices per step")
    p.add_argument("--retry_failed", action="store_true",
                   help="only (re)train blocks not marked done in the "
                        "manifest; the fleet path also resumes from each "
                        "block's rolling chkpnt_fleet.npz")
    p.add_argument("--fleet_checkpoint_interval", type=int, default=2000,
                   help="fleet path: per-block rolling checkpoint cadence "
                        "(0 disables)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: run jax.distributed.initialize "
                        "(COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env "
                        "vars or defaults), build the mesh over every host's "
                        "devices, and train only this host's block slice")
    add_model_args(p)
    add_optim_args(p)
    add_pipeline_args(p)
    args = p.parse_args(argv)

    cfg = config_from_args(args)
    blocks = find_blocks(args.base_path)
    if not blocks:
        raise SystemExit(f"no partition_* blocks under {args.base_path}")

    if args.distributed:
        from pcp_tpu.parallel.distributed import initialize, local_block_slice

        if initialize():
            import jax

            sl = local_block_slice(len(blocks))
            print(
                f"distributed: process {jax.process_index()}/"
                f"{jax.process_count()} owns blocks [{sl.start}:{sl.stop})"
            )
            blocks = blocks[sl]
        else:
            print("distributed: no COORDINATOR_ADDRESS set; single host")

    manifest_path = os.path.join(args.base_path, "train_status.json")
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    if args.retry_failed:
        blocks = [
            (bid, d) for bid, d in blocks
            if manifest.get(bid, {}).get("status") != "done"
        ]
        print(f"retrying {len(blocks)} unfinished blocks")

    from pcp_tpu.scene import load_colmap_scene

    def mark(bid, **kw):
        # locked read-modify-write + atomic replace: under --distributed
        # several processes update disjoint block entries of the same
        # manifest (the shared filesystem is the coordination layer, like
        # the reference's auto_train subprocess hand-off)
        import fcntl

        with open(manifest_path + ".lock", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            if os.path.exists(manifest_path):
                try:
                    with open(manifest_path) as f:
                        manifest.update({
                            k: v for k, v in json.load(f).items()
                            if k != bid
                        })
                except json.JSONDecodeError:
                    pass  # torn file from a pre-lock writer; keep our view
            manifest[bid] = {**manifest.get(bid, {}), **kw,
                             "ts": time.time()}
            tmp = f"{manifest_path}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=2)
            os.replace(tmp, manifest_path)

    def out_dir(block_dir):
        return os.path.join(block_dir, "output")

    if args.intra_block:
        from pcp_tpu.parallel.intra_block import gauss_mesh, train_scene_sharded

        mesh = gauss_mesh(args.intra_block)
        for bid, block_dir in blocks:
            try:
                scene = load_colmap_scene(block_dir)
                bcfg = _block_cfg(cfg, out_dir(block_dir))
                mark(bid, status="running")
                train_scene_sharded(scene, bcfg, mesh,
                                    save_name=f"{bid}_point_cloud")
                mark(bid, status="done")
            except Exception as e:
                print(f"block {bid} FAILED: {e}")
                mark(bid, status="failed", error=str(e))
        return

    if args.sequential:
        from pcp_tpu.train.loop import train_scene

        for bid, block_dir in blocks:
            try:
                scene = load_colmap_scene(block_dir)
                bcfg = _block_cfg(cfg, out_dir(block_dir))
                mark(bid, status="running")
                train_scene(scene, bcfg, save_name=f"{bid}_point_cloud")
                mark(bid, status="done")
            except Exception as e:  # keep going like auto_train.py:50-51
                print(f"block {bid} FAILED: {e}")
                mark(bid, status="failed", error=str(e))
        return

    # --- fleet path: all blocks at once on the mesh ---
    from pcp_tpu.parallel import block_mesh, train_blocks_parallel
    from pcp_tpu.train.loop import save_model

    scenes = []
    for bid, block_dir in blocks:
        scenes.append(load_colmap_scene(block_dir))
        mark(bid, status="running")
    mesh = block_mesh(args.n_devices)
    print(f"fleet: {len(scenes)} blocks over {mesh.devices.size} devices")
    states = train_blocks_parallel(
        scenes, cfg, mesh=mesh, seed=cfg.seed,
        device_data=args.device_data,
        block_dirs=[out_dir(d) for _, d in blocks],
        block_ids=[bid for bid, _ in blocks],
        progress_fn=mark,
        checkpoint_interval=args.fleet_checkpoint_interval,
        resume=args.retry_failed,
    )
    for (bid, block_dir), state in zip(blocks, states):
        bcfg_path = out_dir(block_dir)
        save_model(state, bcfg_path, cfg.optim.iterations, f"{bid}_point_cloud")
        mark(bid, status="done")
    print(f"fleet training complete: {len(blocks)} blocks")


def _block_cfg(cfg, model_path):
    import copy

    bcfg = copy.deepcopy(cfg)
    bcfg.model.model_path = model_path
    return bcfg


if __name__ == "__main__":
    main()
