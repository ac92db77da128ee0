"""View-class tile geometry (OptimConfig.view_classes).

One static tile table must cover the per-tile max over every view it
serves; on large blocks the all-views union is several times any single
view's profile (round-4 quality run: 9.6M slots vs 2.5M per-view pairs).
cluster_views groups views by load profile so each class's compiled step
pays a table close to its members' own loads — the static-shape answer
to the CUDA rasterizer's per-view dynamic buffer sizing
(cuda_rasterizer/rasterizer_impl.cu:155-194)."""

from __future__ import annotations

import numpy as np

from pcp_tpu.ops.binning import cluster_views


def test_cluster_views_separates_disjoint_profiles():
    rng = np.random.default_rng(0)
    t = 200
    # group A: heavy in tiles 0..49; group B: heavy in tiles 100..149
    a = np.zeros((5, t), np.int64)
    b = np.zeros((4, t), np.int64)
    a[:, :50] = rng.integers(500, 900, (5, 50))
    b[:, 100:150] = rng.integers(500, 900, (4, 50))
    loads = np.concatenate([a, b])
    labels, n = cluster_views(loads, 2)
    assert n == 2
    assert len(set(labels[:5])) == 1 and len(set(labels[5:])) == 1
    assert labels[0] != labels[5]


def test_cluster_views_expected_cost_improves():
    """The member-weighted union cost of the clustering must beat the
    single-union cost whenever the profiles are disjoint."""
    rng = np.random.default_rng(1)
    t = 128
    groups = []
    for g in range(3):
        m = np.zeros((4, t), np.int64)
        m[:, g * 40:(g + 1) * 40] = rng.integers(200, 400, (4, 40))
        groups.append(m)
    loads = np.concatenate(groups)
    labels, n = cluster_views(loads, 3)
    single = loads.max(axis=0).sum() * loads.shape[0]
    clustered = sum(
        loads[labels == c].max(axis=0).sum() * (labels == c).sum()
        for c in range(n)
    )
    assert clustered < 0.5 * single


def test_cluster_views_degenerate():
    loads = np.ones((3, 10), np.int64)
    labels, n = cluster_views(loads, 1)
    assert n == 1 and set(labels) == {0}
    labels, n = cluster_views(loads, 5)
    assert n == 3 and sorted(labels) == [0, 1, 2]


def _two_ring_scene(tmp_path, n_points=200, far=5.0, close=1.6):
    """A scene with genuinely distinct per-view load profiles: a far
    ring (the whole cloud concentrated into few central tiles — the
    aerial-overview profile) plus a close-in ring (splats spread wide) —
    the workload view classes exist for."""
    from tests.synthetic import write_synthetic_scene

    root = str(tmp_path / "scene")
    rng = np.random.default_rng(7)
    write_synthetic_scene(root, rng, n_points=n_points, W=96, H=64,
                          radius=far, rings=[(far, 6), (close, 6)])
    return root


def test_two_ring_loads_separate_and_save_slots(tmp_path):
    """The feature's value claim, measured on real two-ring loads:
    cluster_views separates the rings and the member-weighted per-class
    slot cost is well below the single-union cost (the round-4 quality
    run measured 9.6M union slots vs 2.5M per-view pairs)."""
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.models.gaussians import GaussianConfig
    from pcp_tpu.ops.binning import choose_tile_levels, tile_loads_device
    from pcp_tpu.ops.projection import TILE, preprocess
    from pcp_tpu.scene import cameras as cam_mod
    from pcp_tpu.scene import load_colmap_scene

    root = _two_ring_scene(tmp_path, n_points=2000, far=12.0, close=1.5)
    scene = load_colmap_scene(root)
    cams = [cam_mod.from_info(i, 1) for i in scene.cameras]
    params, alive = G.create_from_pcd(
        scene.points, scene.colors,
        GaussianConfig(sh_degree=1, capacity=4096))
    scales = G.scaling_act(params["scaling"])
    opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
    sh = G.sh_coeffs(params)

    loads = []
    for cam in cams:
        viewmat, intrin = cam_mod.camera_device_arrays(cam)
        prep = preprocess(params["xyz"], scales, params["rotation"], opac,
                          sh, viewmat, intrin, (cam.width, cam.height), 1)
        tx = (cam.width + TILE - 1) // TILE
        ty = (cam.height + TILE - 1) // TILE
        loads.append(np.asarray(tile_loads_device(prep["rect"], tx, ty)))
    loads = np.stack(loads)
    num_tiles = loads.shape[1]

    labels, n_cls = cluster_views(loads, 2)
    assert n_cls == 2
    # ring 0 = first 6 cams (far), ring 1 = last 6 (close-in): the
    # clustering must separate them
    assert len(set(labels[:6])) == 1 and len(set(labels[6:])) == 1
    assert labels[0] != labels[6]

    def tile_table_slots(rows):
        # the composite-table component (dense base + level tables) —
        # the term the view-class feature exists to shrink; the full
        # table_slot_cost also carries capacity-scaled expansion terms
        # that don't depend on measured loads at all
        k0, lv = choose_tile_levels(loads[rows], num_tiles)
        return k0 * num_tiles + sum(k * t for k, t in lv)

    single = tile_table_slots(np.ones(len(cams), bool)) * len(cams)
    per_class = sum(
        tile_table_slots(labels == c) * int((labels == c).sum())
        for c in range(n_cls))
    # the per-class geometries must save a material fraction of the
    # all-views union table
    assert per_class < 0.85 * single, (per_class, single)


def test_train_scene_with_view_classes(tmp_path):
    """End-to-end: the two-ring scene trains under view_classes=2; the
    loop builds per-class geometries, nothing overflows or saturates in
    either run (the padding-only premise of the closeness assertion —
    ADVICE r4 #5), and parameters match the single-class run."""
    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train.config import (ModelConfig, OptimConfig,
                                      PipelineConfig, TrainRunConfig)
    from pcp_tpu.train.loop import train_scene

    root = _two_ring_scene(tmp_path)
    scene = load_colmap_scene(root)

    def run(view_classes, logs):
        cfg = TrainRunConfig(
            model=ModelConfig(source_path=root,
                              model_path=str(tmp_path / f"out{view_classes}"),
                              resolution=1, sh_degree=1),
            optim=OptimConfig(iterations=30, capacity=512, max_per_tile=0,
                              view_classes=view_classes,
                              densify_from_iter=1000),
            pipeline=PipelineConfig(use_appearance=False),
            test_iterations=[], save_iterations=[30], seed=0,
        )
        return train_scene(scene, cfg, log_fn=logs.append)

    logs1, logs2 = [], []
    s1 = run(1, logs1)
    s2 = run(2, logs2)
    # both runs complete and produce finite params
    assert np.isfinite(np.asarray(s1.params["xyz"])).all()
    assert np.isfinite(np.asarray(s2.params["xyz"])).all()
    # the two-class run really sized per-class geometry
    assert any("[class 1:" in ln for ln in logs2), logs2[:5]
    # premise check: the closeness assertion below holds only while the
    # per-class geometry is pure padding — no pair may be dropped in
    # either run (ADVICE r4 #5: assert the premise, don't assume it)
    warns1 = [ln for ln in logs1 if "[warn]" in ln]
    warns2 = [ln for ln in logs2 if "[warn]" in ln]
    assert not warns1 and not warns2, (warns1, warns2)
    # identical data, identical schedule: parameters stay close (the
    # geometry only changes padding, not math) — compare a robust stat
    d1 = np.asarray(s1.params["xyz"])
    d2 = np.asarray(s2.params["xyz"])
    assert np.median(np.abs(d1 - d2)) < 1e-3
