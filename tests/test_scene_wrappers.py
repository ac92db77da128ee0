"""Scene / PartitionScene / SceneEval wrappers + camera lists + cut filter."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from tests.synthetic import write_synthetic_scene

    d = tmp_path_factory.mktemp("wscene")
    write_synthetic_scene(str(d), np.random.default_rng(13), n_points=100, n_cams=6)
    return str(d)


def test_scene_wrapper_side_effects(synth, tmp_path):
    from pcp_tpu.models import GaussianConfig
    from pcp_tpu.scene.wrappers import Scene

    model = str(tmp_path / "m")
    scene = Scene(synth, model, resolution=1, eval=True, llffhold=3)
    assert os.path.exists(os.path.join(model, "input.ply"))
    cams = json.load(open(os.path.join(model, "cameras.json")))
    assert len(cams) == 6
    assert {"position", "rotation", "fx", "img_name"} <= set(cams[0])
    assert len(scene.test_cameras) == 2
    assert scene.cameras_extent > 0

    params, alive = scene.create_gaussians(GaussianConfig(capacity=128))
    scene.save(params, alive, 30)
    assert os.path.exists(
        os.path.join(model, "point_cloud", "iteration_30", "point_cloud_1.ply")
    )
    # reload via load_iteration=-1 -> max iteration
    scene2 = Scene(synth, model, resolution=1, load_iteration=-1)
    assert scene2.loaded_iter == 30
    p2, a2 = scene2.create_gaussians(GaussianConfig(capacity=128))
    np.testing.assert_allclose(
        np.asarray(p2["xyz"])[np.asarray(a2)],
        np.asarray(params["xyz"])[np.asarray(alive)], rtol=1e-6,
    )


def test_partition_scene_naming(synth, tmp_path):
    from pcp_tpu.models import GaussianConfig
    from pcp_tpu.scene.wrappers import PartitionScene

    model = str(tmp_path / "pm")
    ps = PartitionScene("07", synth, model, resolution=1)
    params, alive = ps.create_gaussians(GaussianConfig(capacity=128))
    ps.save(params, alive, 5)
    assert os.path.exists(
        os.path.join(model, "point_cloud", "iteration_5", "07_point_cloud.ply")
    )


def test_scene_eval_finds_merged(synth, tmp_path):
    from pcp_tpu.models import GaussianConfig
    from pcp_tpu.scene.wrappers import Scene, SceneEval

    model = str(tmp_path / "em")
    scene = Scene(synth, model, resolution=1)
    params, alive = scene.create_gaussians(GaussianConfig(capacity=128))
    from pcp_tpu.models import save_gaussians_ply

    save_gaussians_ply(os.path.join(model, "point_cloud.ply"), params, alive)
    ev = SceneEval(synth, model, resolution=1, llffhold=3)
    p, a = ev.load_gaussians()
    assert int(a.sum()) == int(alive.sum())
    assert len(ev.test_cameras) == 2


def test_camera_lists_roundtrip(synth, tmp_path):
    from pcp_tpu.partition.camera_lists import (
        filter_cameras_by_list,
        read_cam_list,
        write_camera_lists,
    )
    from pcp_tpu.partition.types import Box2D, PartitionRecord
    from pcp_tpu.scene import load_colmap_scene

    scene = load_colmap_scene(synth)
    rec = PartitionRecord(
        "0", Box2D(-1, -1, 1, 1), Box2D(-2, -2, 2, 2), Box2D(-2, -2, 2, 2),
        np.arange(10), camera_uids=[0, 2, 4],
    )
    write_camera_lists(scene, [rec], str(tmp_path), llffhold=3)
    names = read_cam_list(str(tmp_path / "0_camera.txt"))
    assert len(names) == 3
    cams = filter_cameras_by_list(scene.cameras, names)
    assert sorted(c.uid for c in cams) == [0, 2, 4]
    assert len(read_cam_list(str(tmp_path / "test_cameras.txt"))) == 2


def test_cut_partition_knn_prefilter(tmp_path, rng):
    from pcp_tpu.io.ply import save_gaussian_ply
    from pcp_tpu.merge import cut_partition
    from pcp_tpu.partition.types import Box2D

    # dense cluster + one isolated outlier inside the box
    n = 60
    xyz = np.vstack([
        rng.normal(scale=0.02, size=(n, 3)),
        [[0.4, 0.4, 0.4]],
    ]).astype(np.float32)
    m = n + 1
    p = str(tmp_path / "b.ply")
    save_gaussian_ply(
        p, xyz, np.zeros((m, 1, 3)), np.zeros((m, 15, 3)),
        np.zeros((m, 1)), np.zeros((m, 3)), np.zeros((m, 4)),
    )
    box = Box2D(-1, -1, 1, 1)
    plain = cut_partition(p, box)
    filt = cut_partition(p, box, knn_prefilter=True)
    assert len(plain["xyz"]) == m
    assert len(filt["xyz"]) == n  # outlier dropped


def test_render_cli_iteration_falls_back_to_merged(tmp_path):
    """render --iteration N on a merged model (flat point_cloud.ply, no
    per-iteration snapshots) must use the merged cloud instead of failing."""
    import numpy as np

    from pcp_tpu.cli.render import _find_merged_ply
    from pcp_tpu.models import gaussians as G

    params, alive = G.create_from_pcd(
        np.zeros((4, 3), np.float32) + np.arange(4)[:, None],
        np.full((4, 3), 0.5, np.float32),
        G.GaussianConfig(sh_degree=0, capacity=8),
    )
    ply = tmp_path / "point_cloud.ply"
    G.save_gaussians_ply(str(ply), params, alive)

    path, tag = _find_merged_ply(str(tmp_path), iteration=30000)
    assert path == str(ply)
    assert tag == "merged"
