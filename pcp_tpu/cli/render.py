"""Render CLI — `python -m pcp_tpu.cli.render -m <model_path> -s <scene>`.

Reference: render.py:27-78 — load the merged Gaussians (point_cloud.ply or
point_cloud/iteration_<N>/point_cloud.ply), render train/test splits to
<model>/<split>/ours_<iter>/{renders,gt}/NNNNN.png.
"""

from __future__ import annotations

import argparse
import os


def _find_merged_ply(model_path: str, iteration=None):
    flat = os.path.join(model_path, "point_cloud.ply")
    pc_root = os.path.join(model_path, "point_cloud")
    if iteration is None and os.path.exists(flat):
        return flat, "merged"
    from pcp_tpu.utils.system import search_max_iteration

    it = iteration or search_max_iteration(pc_root)
    d = os.path.join(pc_root, f"iteration_{it}")
    if not os.path.isdir(d) and os.path.exists(flat):
        # a merged model has no per-iteration snapshots: --iteration after
        # cli.merge should still find the flat point_cloud.ply
        print(f"[render] no {d}; using merged {flat}")
        return flat, "merged"
    for f in sorted(os.listdir(d)):
        if f.endswith(".ply"):
            return os.path.join(d, f), str(it)
    raise FileNotFoundError(f"no PLY under {d}")


def render_split(cams, params, alive, sh_degree, out_dir, background, ocfg):
    import numpy as np
    from PIL import Image as PILImage

    from pcp_tpu.eval.render_batch import render_views

    renders = os.path.join(out_dir, "renders")
    gts = os.path.join(out_dir, "gt")
    os.makedirs(renders, exist_ok=True)
    os.makedirs(gts, exist_ok=True)
    images = render_views(
        params, alive, cams, sh_degree, background,
        max_per_tile=ocfg.max_per_tile,
        pairs_per_gaussian=ocfg.pairs_per_gaussian,
    )
    for i, (cam, img) in enumerate(zip(cams, images)):
        arr = (img * 255).astype(np.uint8)
        PILImage.fromarray(arr).save(os.path.join(renders, f"{i:05d}.png"))
        if cam.gt_image is not None:
            PILImage.fromarray((cam.gt_image * 255).astype(np.uint8)).save(
                os.path.join(gts, f"{i:05d}.png")
            )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    from pcp_tpu.cli.common import (
        add_model_args,
        config_from_args,
        man_trans_from_config,
    )

    add_model_args(p)
    p.add_argument("--iteration", type=int, default=None)
    p.add_argument("--skip_train", action="store_true", default=True)
    p.add_argument("--render_train", dest="skip_train", action="store_false")
    p.add_argument("--skip_test", action="store_true")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from pcp_tpu.models.gaussians import GaussianConfig, load_gaussians_ply
    from pcp_tpu.scene import cameras as cam_mod
    from pcp_tpu.scene import load_colmap_scene, split_train_test
    from pcp_tpu.train.config import OptimConfig

    cfg = config_from_args(args)
    ply, tag = _find_merged_ply(cfg.model.model_path, args.iteration)
    scene = load_colmap_scene(
        cfg.model.source_path, images_dir=cfg.model.images,
        man_trans=man_trans_from_config(cfg.model),
    )
    n = _count_ply(ply)
    gcfg = GaussianConfig(sh_degree=cfg.model.sh_degree, capacity=n)
    params, alive = load_gaussians_ply(ply, gcfg)
    print(f"loaded {n} Gaussians from {ply}")

    train_infos, test_infos = split_train_test(
        scene.cameras, True, cfg.model.llffhold
    )
    background = jnp.asarray(
        [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0]
    )
    ocfg = OptimConfig()
    splits = []
    if not args.skip_test:
        splits.append(("test", test_infos))
    if not args.skip_train:
        splits.append(("train", train_infos))
    for split, infos in splits:
        cams = [cam_mod.from_info(i, cfg.model.resolution) for i in infos]
        out = os.path.join(cfg.model.model_path, split, f"ours_{tag}")
        render_split(cams, params, alive, cfg.model.sh_degree, out,
                     background, ocfg)
        print(f"rendered {len(cams)} {split} views -> {out}")


def _count_ply(path: str) -> int:
    from pcp_tpu.io.ply import read_ply

    return len(read_ply(path)["x"])


if __name__ == "__main__":
    main()
