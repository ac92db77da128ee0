"""Partition throughput benchmark: 5M-point synthetic cloud end-to-end.

North star (BASELINE.json): partition a 5M-point COLMAP sparse model in
< 10 s. Measures the full pipeline (outlier filter -> bisection -> expansion
-> camera assignment -> visibility selection), excluding disk export, and
writes PARTITION_BENCH.json at the repo root.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/partition_bench.py
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np

N_POINTS = 5_000_000
N_CAMS = 500
THRESHOLD = 500_000


def make_scene():
    from pcp_tpu.scene.dataset import CameraInfo, SceneInfo, nerfpp_extent

    rng = np.random.default_rng(0)
    # urban-scale layout: a 400 x 400 m quasi-2.5D surface (aerial SfM
    # clouds concentrate on ground/roof surfaces; ~31 pts/m^2 here)
    pts = np.stack(
        [rng.uniform(-200, 200, N_POINTS), rng.uniform(-200, 200, N_POINTS),
         rng.normal(0, 0.5, N_POINTS)], -1,
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (N_POINTS, 3)).astype(np.float32)

    cams = []
    for i in range(N_CAMS):
        ang = 2 * math.pi * i / N_CAMS
        r = 30 + 150 * (i % 10) / 10
        pos = np.array([r * math.cos(ang), r * math.sin(ang), 40.0])
        # nadir-ish camera looking down
        R = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
        t = -R @ pos
        cams.append(CameraInfo(
            uid=i, image_id=i + 1, R=R, t=t, fovx=1.2, fovy=0.9,
            width=1600, height=1200, image_name=f"im{i}.jpg",
        ))
    centers = np.stack([c.center for c in cams])
    return SceneInfo(cameras=cams, points=pts, colors=cols,
                     extent=nerfpp_extent(centers))


def main():
    from pcp_tpu.partition.pipeline import (
        PartitionConfig,
        ProgressiveDataPartitioning,
    )

    scene = make_scene()
    cfg = PartitionConfig(threshold=THRESHOLD, make_plots=False,
                          copy_images=False)
    pdp = ProgressiveDataPartitioning(scene, "/tmp/pcp_partition_bench", cfg)
    t0 = time.perf_counter()
    records = pdp.run()
    dt = time.perf_counter() - t0

    result = {
        "metric": "partition_5M_points_seconds",
        "value": round(dt, 2),
        "unit": "s",
        "n_points": N_POINTS,
        "n_cameras": N_CAMS,
        "n_blocks": len(records),
        "mpts_per_sec": round(N_POINTS / dt / 1e6, 2),
        "target_seconds": 10.0,
        "meets_target": dt < 10.0,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARTITION_BENCH.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
