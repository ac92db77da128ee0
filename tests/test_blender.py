"""Blender / NeRF-synthetic reader (sceneLoadTypeCallbacks["Blender"]
parity, dataset_readers.py:446-520): transforms fixture loads, RGBA
ground truth composites over the background, and a few training
iterations run."""

import json
import os

import numpy as np
import pytest

from tests.synthetic import look_at_w2c, make_gaussian_cloud, render_true_scene

W, H = 64, 48
FOVX = 1.2


def _write_blender_fixture(root, rng, n_train=6, n_test=2):
    """transforms_{train,test}.json + RGBA PNGs rendered from a known
    Gaussian cloud (alpha = 255 inside, so compositing is exercised but
    deterministic)."""
    from PIL import Image as PILImage

    xyz, rgb, scales, quats, opac = make_gaussian_cloud(rng, 100)
    fx = W / (2.0 * np.tan(FOVX / 2.0))

    def frames(n, start, sub):
        os.makedirs(root / sub, exist_ok=True)
        out = []
        for i in range(n):
            ang = 2 * np.pi * (start + i) / (n_train + n_test)
            pos = np.array([5.0 * np.cos(ang), 5.0 * np.sin(ang), 1.5])
            R, t = look_at_w2c(pos, (0.0, 0.0, 0.0))
            img = render_true_scene(
                xyz, rgb, scales, quats, opac, R, t, fx, fx, W, H
            )
            rgba = np.concatenate(
                [img, np.full((H, W, 1), 1.0, np.float32)], axis=-1
            )
            name = f"r_{start + i}"
            PILImage.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
                root / sub / f"{name}.png"
            )
            # COLMAP w2c -> OpenGL c2w for the transforms file
            c2w = np.eye(4)
            c2w[:3, :3] = R.T
            c2w[:3, 3] = -R.T @ t
            c2w[:3, 1:3] *= -1.0
            out.append(
                {"file_path": f"./{sub}/{name}", "transform_matrix": c2w.tolist()}
            )
        return out

    for split, n, start in (("train", n_train, 0), ("test", n_test, n_train)):
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump(
                {"camera_angle_x": FOVX, "frames": frames(n, start, split)}, f
            )
    return xyz, rgb


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("blender")
    rng = np.random.default_rng(3)
    _write_blender_fixture(root, rng)
    return root


def test_loads_with_explicit_split(blender_dir):
    from pcp_tpu.scene import is_blender_scene, load_blender_scene

    assert is_blender_scene(str(blender_dir))
    scene = load_blender_scene(str(blender_dir), eval_split=True, seed=0,
                               num_random_points=500)
    assert len(scene.cameras) == 8
    assert len(scene.test_camera_uids) == 2
    assert scene.points.shape == (500, 3)
    # random init persisted for reruns
    assert os.path.exists(blender_dir / "points3d.ply")


def test_camera_geometry_roundtrip(blender_dir):
    """The OpenGL->COLMAP flip must restore the original w2c extrinsics:
    each camera center lies on the radius-5 circle at z=1.5."""
    from pcp_tpu.scene import load_blender_scene

    scene = load_blender_scene(str(blender_dir), num_random_points=10)
    for c in scene.cameras:
        center = c.center
        np.testing.assert_allclose(np.linalg.norm(center[:2]), 5.0, atol=1e-5)
        np.testing.assert_allclose(center[2], 1.5, atol=1e-5)


def test_rgba_composites_over_background(blender_dir):
    from pcp_tpu.scene import cameras as cam_mod
    from pcp_tpu.scene import load_blender_scene

    scene = load_blender_scene(str(blender_dir), white_background=True,
                               num_random_points=10)
    cam = cam_mod.from_info(scene.cameras[0], 1)
    assert cam.gt_image.shape == (H, W, 3)
    assert np.all(np.isfinite(cam.gt_image))


def test_trains_a_few_iterations(blender_dir, tmp_path):
    from pcp_tpu.scene import load_scene
    from pcp_tpu.train.config import (
        ModelConfig,
        OptimConfig,
        PipelineConfig,
        TrainRunConfig,
    )
    from pcp_tpu.train.loop import train_scene

    scene = load_scene(str(blender_dir), eval_split=False)
    cfg = TrainRunConfig(
        model=ModelConfig(source_path=str(blender_dir),
                          model_path=str(tmp_path / "out"),
                          resolution=1, sh_degree=1),
        optim=OptimConfig(iterations=20, capacity=512, max_per_tile=64,
                          densify_from_iter=1_000),
        pipeline=PipelineConfig(use_appearance=False),
        test_iterations=[], save_iterations=[20],
    )
    train_scene(scene, cfg, log_fn=None)
    assert os.path.exists(
        tmp_path / "out" / "point_cloud" / "iteration_20" / "point_cloud.ply"
    )
