"""Full pipeline through the CLI drivers: partition -> auto_train -> merge ->
render -> metrics on a synthetic scene. The reference's documented workflow
(README.md:66-132) end to end."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    from tests.synthetic import write_synthetic_scene

    d = tmp_path_factory.mktemp("pipe")
    write_synthetic_scene(
        str(d), np.random.default_rng(5), n_points=300, n_cams=12, W=64, H=48
    )
    return str(d)


def test_full_pipeline(pipeline_dir):
    from pcp_tpu.cli import auto_train, merge, metrics, partition, render

    model_dir = os.path.join(pipeline_dir, "model")

    # 1. partition (CLI)
    partition.main([
        pipeline_dir, "--threshold", "80", "--expansion_distance", "10",
        "--visible_rate", "0.05", "--no_outlier_removal", "--no_plots",
        "--llffhold", "6",
    ])
    visible = os.path.join(model_dir, "split_result", "visible")
    assert os.path.isdir(visible)
    blocks = sorted(os.listdir(visible))
    assert len(blocks) >= 2
    # held-out test set written
    assert os.path.isdir(os.path.join(pipeline_dir, "test", "sparse", "0"))

    # 2. train all blocks (sequential path, tiny budget) with the REAL
    # workflow switches ON: densification runs twice (iters 30/60) and the
    # appearance decoupling net trains alongside (train.py:116-147)
    auto_train.main([
        "--base_path", visible, "--sequential", "--iterations", "80",
        "--capacity", "512", "--max_per_tile", "128",
        "--densify_from_iter", "30", "--densification_interval", "30",
        "--densify_until_iter", "70",
        "--resolution", "1",
    ])
    manifest = json.load(open(os.path.join(visible, "train_status.json")))
    assert all(v["status"] == "done" for v in manifest.values()), manifest

    # 3. merge
    merge.main(["-m", model_dir])
    assert os.path.exists(os.path.join(model_dir, "point_cloud.ply"))

    # 4. render held-out views
    render.main([
        "-s", pipeline_dir, "-m", model_dir, "--resolution", "1",
        "--llffhold", "6",
    ])
    method_dir = os.path.join(model_dir, "test", "ours_merged")
    rendered = os.listdir(os.path.join(method_dir, "renders"))
    assert len(rendered) == 2  # 12 cams, llffhold 6

    # 5. metrics
    metrics.main(["-m", model_dir])
    results = json.load(open(os.path.join(method_dir, "results.json")))
    assert results["PSNR"] > 14.0, results
    assert results["SSIM"] > 0.3, results
    per_view = json.load(open(os.path.join(method_dir, "per_view.json")))
    assert len(per_view) == 2
    assert os.path.isdir(os.path.join(method_dir, "renders_cc"))


def test_camera_grid_partitioner_trains(pipeline_dir):
    """--partitioner camera_grid (the VastGaussian family,
    data_partition.py:35-557) exports the same split_result/visible layout
    and its blocks train through auto_train."""
    import json

    from pcp_tpu.cli import auto_train, partition

    model_dir = os.path.join(pipeline_dir, "model_cg")
    partition.main([
        pipeline_dir, "--model_dir", model_dir,
        "--partitioner", "camera_grid", "--m_region", "2", "--n_region", "1",
        "--extend_rate", "0.2", "--no_plots", "--llffhold", "6",
    ])
    visible = os.path.join(model_dir, "split_result", "visible")
    blocks = sorted(os.listdir(visible))
    assert blocks == ["1_1", "2_1"]
    for b in blocks:
        assert os.path.isdir(
            os.path.join(visible, b, f"partition_{b}", "sparse", "0"))

    auto_train.main([
        "--base_path", visible, "--sequential", "--iterations", "40",
        "--capacity", "512", "--max_per_tile", "128",
        "--densify_from_iter", "100000", "--no_appearance",
        "--resolution", "1",
    ])
    manifest = json.load(open(os.path.join(visible, "train_status.json")))
    assert all(v["status"] == "done" for v in manifest.values()), manifest


def test_quadtree_partitioner_exports(pipeline_dir):
    """--partitioner quadtree (legacy shen_partition.py family) exports the
    standard layout with merged 4-way regions."""
    from pcp_tpu.cli import partition

    model_dir = os.path.join(pipeline_dir, "model_qt")
    partition.main([
        pipeline_dir, "--model_dir", model_dir,
        "--partitioner", "quadtree", "--threshold", "120",
        "--extend_rate", "0.2", "--no_outlier_removal", "--no_plots",
        "--visible_rate", "0.05", "--llffhold", "6",
    ])
    visible = os.path.join(model_dir, "split_result", "visible")
    blocks = sorted(os.listdir(visible))
    assert len(blocks) >= 2
    import pickle

    recs = pickle.load(open(os.path.join(model_dir, "partition_data.pkl"),
                            "rb"))
    assert {r.partition_id for r in recs} == set(blocks)
    total = sum(r.point_num for r in recs)
    assert total >= 300  # expansion re-extracts overlapping points
