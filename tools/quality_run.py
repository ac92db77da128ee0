"""Full-schedule quality proof on the real chip (VERDICT round-2 item 3).

Drives the documented production workflow end to end at a
reference-proportioned schedule:

    partition -> auto_train (sequential; densify ON through a 64k-slot
    cap, appearance ON, 10k iterations/block) -> merge -> render ->
    metrics

on a mid-size synthetic scene whose ground truth is rendered from a known
Gaussian set (tests/synthetic.py), plus a no-densify control at the same
iteration budget. Writes QUALITY_r2.json at the repo root with both
PSNR/SSIM rows; the densify-on run must beat the control.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/quality_run.py
       [--scene DIR] [--iters N] (scene is reused if it already exists)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W, H = 400, 304
N_POINTS = 4000
N_CAMS = 48
ITERS = 10_000
CAPACITY = 1 << 16
LLFFHOLD = 8


def run_variant(scene_dir, name, iters, densify: bool):
    from pcp_tpu.cli import auto_train, merge, metrics, render

    t0 = time.time()
    model_dir = os.path.join(scene_dir, "model")
    visible = os.path.join(model_dir, "split_result", "visible")
    densify_args = (
        ["--densify_from_iter", "500", "--densification_interval", "100",
         "--densify_until_iter", str(int(iters * 0.75)),
         "--opacity_reset_interval", "3000"]
        if densify else
        ["--densify_from_iter", str(10 * iters)]
    )
    auto_train.main([
        "--base_path", visible, "--sequential",
        "--iterations", str(iters),
        "--capacity", str(CAPACITY), "--max_per_tile", "512",
        "--resolution", "1",
        *densify_args,
    ])
    manifest = json.load(open(os.path.join(visible, "train_status.json")))
    assert all(v["status"] == "done" for v in manifest.values()), manifest

    merge.main(["-m", model_dir])
    render.main(["-s", scene_dir, "-m", model_dir, "--resolution", "1",
                 "--llffhold", str(LLFFHOLD)])
    metrics.main(["-m", model_dir])
    method_dir = os.path.join(model_dir, "test", "ours_merged")
    results = json.load(open(os.path.join(method_dir, "results.json")))
    out = {
        "variant": name,
        "iterations": iters,
        "densify": densify,
        "PSNR": results["PSNR"],
        "SSIM": results["SSIM"],
        "LPIPS": results.get("LPIPS"),
        "wall_minutes": round((time.time() - t0) / 60.0, 1),
        "blocks": len(manifest),
    }
    # stash the model away so the next variant starts clean
    shutil.move(model_dir, os.path.join(scene_dir, f"model_{name}"))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/tmp/quality_scene")
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()

    from pcp_tpu.cli import partition
    from tests.synthetic import write_synthetic_scene

    scene = args.scene
    if not os.path.isdir(os.path.join(scene, "sparse")):
        os.makedirs(scene, exist_ok=True)
        write_synthetic_scene(
            scene, np.random.default_rng(11), n_points=N_POINTS,
            n_cams=N_CAMS, W=W, H=H,
        )
        print(f"scene written: {scene}")

    rows = []
    for name, densify in [("densify", True), ("no_densify_control", False)]:
        # fresh partition per variant (auto_train mutates block output dirs)
        model_dir = os.path.join(scene, "model")
        if os.path.isdir(model_dir):
            shutil.rmtree(model_dir)
        # expansion 6 so the radius-5 orbit cameras fall inside the
        # extended boxes (center-in-box assignment); visibility selection
        # (visible_rate) then trims each block's camera set
        partition.main([
            scene, "--threshold", "1500", "--expansion_distance", "6",
            "--visible_rate", "0.25", "--no_plots",
            "--llffhold", str(LLFFHOLD),
        ])
        rows.append(run_variant(scene, name, args.iters, densify))
        print(json.dumps(rows[-1]))

    out = {
        "workload": {
            "scene": f"synthetic {N_POINTS} pts, {N_CAMS} cams, {W}x{H}",
            "schedule": f"{args.iters} iters/block, densify 500..75% "
                        f"every 100, opacity reset 3000, appearance ON, "
                        f"capacity {CAPACITY}",
        },
        "runs": rows,
    }
    with open(os.path.join(REPO, "QUALITY_r2.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
