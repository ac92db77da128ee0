"""Scene wrapper classes mirroring the reference's Scene / PartitionScene /
Scene_Eval (scene/__init__.py:21-228).

The functional core lives in pcp_tpu.scene.dataset + pcp_tpu.train.loop;
these classes reproduce the reference's object API and side effects: writing
``input.ply`` + ``cameras.json`` into the model dir, shuffled train cameras,
``cameras_extent`` from the nerf++ radius, and the PLY naming conventions
(point_cloud_1.ply for Scene, {id}_point_cloud.ply for PartitionScene,
point_cloud.ply for SceneEval — SURVEY §2.5 defect 12 documents that the
names differ on purpose).
"""

from __future__ import annotations

import json
import os
import random
from typing import List, Optional

import numpy as np

from pcp_tpu.models import gaussians as G
from pcp_tpu.scene import cameras as cam_mod
from pcp_tpu.scene.dataset import (
    SceneInfo,
    ensure_input_ply,
    load_colmap_scene,
    split_train_test,
)
from pcp_tpu.utils.system import search_max_iteration


def _camera_json_entry(idx: int, cam: cam_mod.Camera) -> dict:
    """cameras.json schema (utils/camera_utils.py camera_to_JSON)."""
    w2c = cam.viewmat
    c2w = np.linalg.inv(w2c)
    return {
        "id": idx,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": c2w[:3, 3].tolist(),
        "rotation": c2w[:3, :3].tolist(),
        "fx": cam.fx,
        "fy": cam.fy,
    }


class Scene:
    """Full-scene wrapper (scene/__init__.py:21-93)."""

    ply_stem = "point_cloud_1"

    def __init__(
        self,
        source_path: str,
        model_path: str,
        *,
        images: str = "images",
        resolution: int = -1,
        eval: bool = False,
        llffhold: int = 83,
        shuffle: bool = True,
        load_iteration: Optional[int] = None,
        man_trans=None,
        seed: int = 0,
        white_background: bool = False,
    ):
        from pcp_tpu.scene.blender import is_blender_scene, load_blender_scene

        self.model_path = model_path
        if is_blender_scene(source_path):
            # reference Scene sniffs transforms_train.json (scene/__init__.py:40-47)
            self.info: SceneInfo = load_blender_scene(
                source_path, white_background=white_background, eval_split=eval
            )
        else:
            self.info = load_colmap_scene(
                source_path, images_dir=images, man_trans=man_trans
            )
        os.makedirs(model_path, exist_ok=True)
        ensure_input_ply(self.info, model_path)

        train_infos, test_infos = split_train_test(
            self.info.cameras, eval, llffhold,
            explicit_test=self.info.test_camera_uids,
        )
        self.train_cameras: List[cam_mod.Camera] = [
            cam_mod.from_info(i, resolution) for i in train_infos
        ]
        self.test_cameras: List[cam_mod.Camera] = [
            cam_mod.from_info(i, resolution) for i in test_infos
        ]
        with open(os.path.join(model_path, "cameras.json"), "w") as f:
            json.dump(
                [
                    _camera_json_entry(i, c)
                    for i, c in enumerate(self.train_cameras + self.test_cameras)
                ],
                f,
            )
        if shuffle:
            random.Random(seed).shuffle(self.train_cameras)
        self.cameras_extent = self.info.extent
        self.loaded_iter = None
        if load_iteration is not None:
            self.loaded_iter = (
                load_iteration
                if load_iteration > 0
                else search_max_iteration(os.path.join(model_path, "point_cloud"))
            )

    # -- model creation / persistence --------------------------------------

    def create_gaussians(self, cfg: G.GaussianConfig):
        if self.loaded_iter:
            return G.load_gaussians_ply(self.ply_path(self.loaded_iter), cfg)
        return G.create_from_pcd(self.info.points, self.info.colors, cfg)

    def ply_path(self, iteration: int) -> str:
        return os.path.join(
            self.model_path, "point_cloud", f"iteration_{iteration}",
            f"{self.ply_stem}.ply",
        )

    def save(self, params, alive, iteration: int) -> None:
        os.makedirs(os.path.dirname(self.ply_path(iteration)), exist_ok=True)
        G.save_gaussians_ply(self.ply_path(iteration), params, alive)

    def get_train_cameras(self) -> List[cam_mod.Camera]:
        return self.train_cameras

    def get_test_cameras(self) -> List[cam_mod.Camera]:
        return self.test_cameras


class PartitionScene(Scene):
    """Per-block wrapper: saves `{partition_id}_point_cloud.ply`
    (scene/__init__.py:96-173)."""

    def __init__(self, partition_id: str, *args, **kwargs):
        self.partition_id = partition_id
        self.ply_stem = f"{partition_id}_point_cloud"
        super().__init__(*args, **kwargs)


class SceneEval:
    """Evaluation wrapper: test cameras + a merged point_cloud.ply
    (scene/__init__.py:176-228)."""

    def __init__(
        self,
        source_path: str,
        model_path: str,
        *,
        images: str = "images",
        resolution: int = -1,
        llffhold: int = 83,
        load_iteration: Optional[int] = None,
        man_trans=None,
    ):
        self.model_path = model_path
        self.info = load_colmap_scene(
            source_path, images_dir=images, man_trans=man_trans
        )
        train_infos, test_infos = split_train_test(
            self.info.cameras, True, llffhold
        )
        self.train_cameras = [cam_mod.from_info(i, resolution) for i in train_infos]
        self.test_cameras = [cam_mod.from_info(i, resolution) for i in test_infos]
        flat = os.path.join(model_path, "point_cloud.ply")
        if load_iteration is None and os.path.exists(flat):
            self.ply = flat
        else:
            it = load_iteration or search_max_iteration(
                os.path.join(model_path, "point_cloud")
            )
            d = os.path.join(model_path, "point_cloud", f"iteration_{it}")
            plys = [f for f in sorted(os.listdir(d)) if f.endswith(".ply")]
            self.ply = os.path.join(d, plys[0])

    def load_gaussians(self, cfg: Optional[G.GaussianConfig] = None):
        from pcp_tpu.io.ply import read_ply

        n = len(read_ply(self.ply)["x"])
        cfg = cfg or G.GaussianConfig(sh_degree=3, capacity=n)
        return G.load_gaussians_ply(self.ply, cfg)
