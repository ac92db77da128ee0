"""Partition engine: bisection invariants, point ops vs brute force,
visibility ratios, end-to-end export layout, and seamless merge."""

import os
import pickle

import numpy as np
import pytest

from pcp_tpu.partition import (
    Box2D,
    PartitionRecord,
    balanced_bisection,
    hull_area_ratio,
    radius_outlier_removal,
    voxel_downsample,
)
from pcp_tpu.partition.density import SLACK, find_adjacent


def test_bisection_invariants(rng):
    xy = rng.normal(size=(5000, 2)).astype(np.float32) * [10, 3]
    threshold = 600
    leaves = balanced_bisection(xy, threshold)
    # coverage + disjointness
    all_idx = np.sort(np.concatenate([idx for _, idx, _ in leaves]))
    np.testing.assert_array_equal(all_idx, np.arange(5000))
    for pid, idx, box in leaves:
        assert len(idx) <= SLACK * threshold + 1  # leaf bound (density_partition.py:32)
        xyp = xy[idx]
        assert np.all(xyp[:, 0] >= box.xmin - 1e-5) and np.all(xyp[:, 0] <= box.xmax + 1e-5)
        assert np.all(xyp[:, 1] >= box.ymin - 1e-5) and np.all(xyp[:, 1] <= box.ymax + 1e-5)
    # balanced: sibling counts differ by <= 1 at each split => all leaves
    # within 2x of each other at equal depth
    counts = sorted(len(idx) for _, idx, _ in leaves)
    assert counts[-1] <= 2.5 * counts[0]


def test_bisection_max_depth(rng):
    xy = rng.normal(size=(4096, 2))
    leaves = balanced_bisection(xy, threshold=1, max_depth=3)
    assert len(leaves) == 8  # 2^3
    assert all(len(pid) == 3 for pid, _, _ in leaves)


def test_find_adjacent():
    boxes = [
        Box2D(0, 0, 1, 1), Box2D(1, 0, 2, 1),   # share x=1 edge
        Box2D(0, 1, 2, 2),                       # on top of both
        Box2D(5, 5, 6, 6),                       # island
    ]
    assert find_adjacent(boxes, 0) == [1, 2]
    assert find_adjacent(boxes, 3) == []


def test_radius_outlier_removal_vs_bruteforce(rng):
    pts = rng.uniform(0, 5, size=(300, 3))
    keep = radius_outlier_removal(pts, nb_points=4, radius=0.8)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    counts = (d2 <= 0.8**2).sum(1) - 1
    np.testing.assert_array_equal(keep, counts >= 4)


def test_voxel_downsample_centroids():
    pts = np.array([[0.01, 0.01, 0.01], [0.03, 0.03, 0.03], [1.5, 1.5, 1.5]])
    out = voxel_downsample(pts, 1.0)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(sorted(out[:, 0]), [0.02, 1.5], atol=1e-9)


def test_hull_area_ratio_known_cases():
    w, h = 100.0, 50.0
    full = np.array([[0, 0], [100, 0], [100, 50], [0, 50], [50, 25]], float)
    assert hull_area_ratio(full, w, h) == pytest.approx(1.0)
    half = np.array([[0, 0], [50, 0], [50, 50], [0, 50]], float)
    assert hull_area_ratio(half, w, h) == pytest.approx(0.5)
    outside = np.array([[200, 200], [300, 200], [300, 300], [200, 300]], float)
    assert hull_area_ratio(outside, w, h) == 0.0
    oversized = np.array([[-100, -100], [300, -100], [300, 300], [-100, 300]], float)
    assert hull_area_ratio(oversized, w, h) == pytest.approx(1.0)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from tests.synthetic import write_synthetic_scene

    d = tmp_path_factory.mktemp("pscene")
    write_synthetic_scene(str(d), np.random.default_rng(7), n_points=400, n_cams=12)
    return str(d)


def test_partition_end_to_end(synth, tmp_path):
    from pcp_tpu.partition.pipeline import PartitionConfig, run_partition
    from pcp_tpu.scene import load_colmap_scene

    scene = load_colmap_scene(synth)
    model_path = str(tmp_path / "model")
    cfg = PartitionConfig(
        threshold=100, expansion_distance=10.0, point_expand_ratio=0.1,
        visible_rate=0.05, voxel_size=0.05, remove_outliers=False,
        make_plots=True, llffhold=4,
    )
    records = run_partition(scene, model_path, cfg)
    assert len(records) >= 2
    # every block has points and at least one camera sees it
    assert all(r.point_num > 0 for r in records)
    assert any(len(r.camera_uids) > 0 for r in records)

    # reference on-disk layout (README.md:114-123)
    for r in records:
        root = os.path.join(model_path, "split_result", "visible", r.partition_id)
        assert os.path.exists(os.path.join(root, f"partition_{r.partition_id}.pkl"))
        block = os.path.join(root, f"partition_{r.partition_id}")
        if r.camera_uids:
            for fn in ("cameras.bin", "images.bin", "points3D.bin"):
                assert os.path.exists(os.path.join(block, "sparse", "0", fn))
            assert os.listdir(os.path.join(block, "images"))
    assert os.path.exists(os.path.join(model_path, "partition_data.pkl"))
    assert os.path.exists(os.path.join(model_path, "partitions.png"))

    # exported block loads back as a valid scene
    from pcp_tpu.partition.export import load_partition_data

    recs2 = load_partition_data(os.path.join(model_path, "partition_data.pkl"))
    assert [r.partition_id for r in recs2] == [r.partition_id for r in records]
    first = next(r for r in records if r.camera_uids)
    block_dir = os.path.join(
        model_path, "split_result", "visible", first.partition_id,
        f"partition_{first.partition_id}",
    )
    sub = load_colmap_scene(block_dir)
    assert len(sub.cameras) == len(first.camera_uids)
    assert len(sub.points) == first.point_num


def test_seamless_merge_dedups_overlap(tmp_path, rng):
    from pcp_tpu.io.ply import load_gaussian_ply, save_gaussian_ply
    from pcp_tpu.merge import seamless_merge

    # two abutting cells; blocks trained with overlap across the boundary
    recs = [
        PartitionRecord("0", Box2D(-1, -1, 0, 1), Box2D(-2, -2, 1, 2),
                        Box2D(-1.5, -1.5, 0.5, 1.5), np.arange(1)),
        PartitionRecord("1", Box2D(0, -1, 1, 1), Box2D(-1, -2, 2, 2),
                        Box2D(-0.5, -1.5, 1.5, 1.5), np.arange(1)),
    ]

    def fake_block(n, xlo, xhi, seed):
        r = np.random.default_rng(seed)
        return {
            "xyz": np.stack([r.uniform(xlo, xhi, n), r.uniform(-1, 1, n),
                             r.uniform(-1, 1, n)], -1).astype(np.float32),
            "f_dc": r.normal(size=(n, 1, 3)).astype(np.float32),
            "f_rest": np.zeros((n, 15, 3), np.float32),
            "opacity": r.normal(size=(n, 1)).astype(np.float32),
            "scaling": r.normal(size=(n, 3)).astype(np.float32),
            "rotation": r.normal(size=(n, 4)).astype(np.float32),
        }

    b0 = fake_block(50, -1.4, 0.4, 1)   # spills right of x=0
    b1 = fake_block(50, -0.4, 1.4, 2)   # spills left of x=0
    d = tmp_path / "blocks"
    d.mkdir()
    for pid, b in (("0", b0), ("1", b1)):
        save_gaussian_ply(
            str(d / f"{pid}_point_cloud.ply"), b["xyz"], b["f_dc"],
            b["f_rest"], b["opacity"], b["scaling"], b["rotation"],
        )
    out = str(tmp_path / "point_cloud.ply")
    merged = seamless_merge(recs, str(d), out)

    # block 0 keeps x <= 0 (boundary side), block 1 keeps x > 0... and the
    # unbounded outer sides keep the overhang
    n0 = (b0["xyz"][:, 0] <= 0).sum()
    n1 = (b1["xyz"][:, 0] >= 0).sum()
    assert len(merged["xyz"]) == n0 + n1
    assert os.path.exists(out)
    back = load_gaussian_ply(out)
    assert len(back["xyz"]) == n0 + n1
    # no Gaussians outside their side survived
    assert np.all(np.sort(merged["xyz"][:, 0]) == np.sort(
        np.concatenate([b0["xyz"][b0["xyz"][:, 0] <= 0, 0],
                        b1["xyz"][b1["xyz"][:, 0] >= 0, 0]])))


def test_camera_grid_partition(synth):
    from pcp_tpu.partition.camera_grid import (
        CameraGridConfig,
        camera_region_division,
        refine_boxes,
        run_camera_grid_partition,
    )
    from pcp_tpu.scene import load_colmap_scene

    scene = load_colmap_scene(synth, keep_point_ids=True)
    cfg = CameraGridConfig(m_region=2, n_region=2, visible_rate=0.01)
    records = run_camera_grid_partition(scene, cfg)
    assert len(records) == 4
    # balanced: every block got ~equal cameras before visibility additions
    # (12 cams / 4 = 3 minimum each)
    assert all(len(r.camera_uids) >= 3 for r in records)
    # boxes tile seamlessly: shared borders equal
    import numpy as np

    centers = np.stack([c.center for c in scene.cameras])[:, :2]
    groups = camera_region_division(centers, 2, 2)
    boxes = refine_boxes(groups, centers, 2, 2)
    assert boxes["1_1"].ymax == boxes["1_2"].ymin
    assert boxes["1_1"].xmax == boxes["2_1"].xmin
    assert boxes["1_2"].xmax == boxes["2_2"].xmin


def test_camera_grid_visibility_adds_points(synth):
    from pcp_tpu.partition.camera_grid import (
        CameraGridConfig,
        run_camera_grid_partition,
    )
    from pcp_tpu.scene import load_colmap_scene

    scene = load_colmap_scene(synth, keep_point_ids=True)
    strict = run_camera_grid_partition(
        scene, CameraGridConfig(2, 2, visible_rate=0.99))
    loose = run_camera_grid_partition(
        scene, CameraGridConfig(2, 2, visible_rate=0.01))
    # looser visibility must never shrink camera sets
    for s, l in zip(strict, loose):
        assert set(s.camera_uids) <= set(l.camera_uids)


def test_radius_outlier_large_n_grid_path_exact(rng):
    """The >500k two-grid screen + exact remainder must match brute kNN
    semantics exactly (open3d remove_radius_outlier parity). On the CPU
    test backend this exercises the sparse-cell fallback; the accelerated
    dense-grid screen is validated by tools/ on the real chip."""
    import numpy as np
    from scipy.spatial import cKDTree

    from pcp_tpu.partition.points import radius_outlier_removal

    n = 600_000
    pts = np.stack(
        [rng.uniform(-60, 60, n), rng.uniform(-60, 60, n),
         rng.normal(0, 0.5, n)], -1,
    ).astype(np.float32)
    keep = radius_outlier_removal(pts, nb_points=5, radius=1.0)

    tree = cKDTree(pts.astype(np.float64))
    d, _ = tree.query(pts.astype(np.float64), k=6, workers=-1)
    np.testing.assert_array_equal(keep, d[:, -1] <= 1.0)
