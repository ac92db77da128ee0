"""Point-cloud hygiene ops: radius outlier removal and voxel downsampling.

Replace the reference's open3d calls (shen_partition_utils.py:28-55
`remove_outliers` with nb_points=5, radius=1.0) and the Python-dict voxel
loop (shen_partation_densify.py:541-614 `downsample_point_cloud`,
voxel_size=0.1) with vectorized numpy grid hashing — the dict loop is the
partitioner's top hot spot in the reference (SURVEY §3.1).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _cell_ids(q: np.ndarray) -> np.ndarray:
    """Unique int64 id per 3D integer cell (collision-free by construction:
    coordinates are shifted non-negative and packed in 21-bit fields)."""
    q = q - q.min(axis=0)
    assert q.max() < (1 << 21), "grid too fine for 21-bit packing"
    return (q[:, 0].astype(np.int64) << 42) | (q[:, 1].astype(np.int64) << 21) | q[:, 2].astype(np.int64)


def voxel_downsample(points: np.ndarray, voxel_size: float,
                     colors: np.ndarray = None):
    """Centroid per occupied voxel (open3d voxel_down_sample semantics).

    Returns points (M, 3) [and colors (M, 3) if given].
    """
    q = np.floor(points / voxel_size).astype(np.int64)
    ids = _cell_ids(q)
    order = np.argsort(ids, kind="stable")
    ids_s = ids[order]
    starts = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
    counts = np.diff(np.r_[starts, len(ids_s)])
    sums = np.add.reduceat(points[order], starts, axis=0)
    out_pts = sums / counts[:, None]
    if colors is None:
        return out_pts
    csums = np.add.reduceat(colors[order], starts, axis=0)
    return out_pts, csums / counts[:, None]


def radius_outlier_removal(
    points: np.ndarray, nb_points: int = 5, radius: float = 1.0
) -> np.ndarray:
    """Keep points having >= nb_points neighbours within ``radius``
    (open3d remove_radius_outlier semantics; self excluded). Returns a bool
    keep-mask.

    Primary path: scipy cKDTree radius counts (C, multithreaded) — handles
    5M-point clouds in seconds. Fallback: grid-hash cells of side ``radius``
    with exact distance tests per 27-cell neighbourhood.
    """
    n = len(points)
    # ">= nb_points neighbours within radius" == "distance to the
    # nb_points-th neighbour <= radius" — a kNN problem.
    if n > 500_000:
        # Morton-window kNN (pcp_tpu.ops.knn) — approximate (overestimates
        # only, i.e. errs toward removing borderline points). Offloaded to
        # the accelerator when one is attached (the partition host may have
        # a single CPU core; the filter is the pipeline's only heavy op).
        import jax

        if jax.default_backend() not in ("cpu",):
            from pcp_tpu.ops.knn import kth_nn_dist2

            d2 = np.asarray(kth_nn_dist2(points, nb_points, window=16))
        else:
            from pcp_tpu.ops.knn import kth_nn_dist2_np

            d2 = kth_nn_dist2_np(points, nb_points, window=32)
        return d2 <= radius * radius
    try:
        from scipy.spatial import cKDTree

        pts = np.ascontiguousarray(points, np.float64)
        tree = cKDTree(pts)
        k = min(nb_points + 1, n)  # +1: query returns the point itself first
        dist, _ = tree.query(pts, k=k, workers=-1)
        if k < nb_points + 1:
            return np.zeros(n, bool)
        return dist[:, -1] <= radius
    except ImportError:
        pass
    n = len(points)
    if n == 0:
        return np.zeros(0, bool)
    q = np.floor(points / radius).astype(np.int64)
    qmin = q.min(axis=0)
    q = q - qmin
    dims = q.max(axis=0) + 1
    ids = (q[:, 0] * dims[1] + q[:, 1]) * dims[2] + q[:, 2]
    order = np.argsort(ids, kind="stable")
    ids_s = ids[order]
    starts = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
    uniq = ids_s[starts]
    bounds = np.r_[starts, n]
    cell_of = {int(c): k for k, c in enumerate(uniq)}

    r2 = radius * radius
    counts = np.zeros(n, np.int64)
    pts_s = points[order]
    # For each occupied cell, gather candidates from the 27-neighbourhood
    # once and count pairwise hits (cells hold few points; the quadratic
    # term is local).
    for k in range(len(uniq)):
        c = int(uniq[k])
        cz = c % dims[2]
        cy = (c // dims[2]) % dims[1]
        cx = c // (dims[1] * dims[2])
        cand = []
        for ox in (-1, 0, 1):
            x = cx + ox
            if not 0 <= x < dims[0]:
                continue
            for oy in (-1, 0, 1):
                y = cy + oy
                if not 0 <= y < dims[1]:
                    continue
                for oz in (-1, 0, 1):
                    z = cz + oz
                    if not 0 <= z < dims[2]:
                        continue
                    cc = (x * dims[1] + y) * dims[2] + z
                    j = cell_of.get(int(cc))
                    if j is not None:
                        cand.append(np.arange(bounds[j], bounds[j + 1]))
        cand = np.concatenate(cand)
        mine = np.arange(bounds[k], bounds[k + 1])
        d2 = ((pts_s[mine, None, :] - pts_s[None, cand, :]) ** 2).sum(-1)
        counts[mine] = (d2 <= r2).sum(axis=1) - 1  # exclude self
    keep = np.zeros(n, bool)
    keep[order] = counts >= nb_points
    return keep
