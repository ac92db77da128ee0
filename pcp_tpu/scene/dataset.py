"""COLMAP scene -> camera infos, train/test split, scene extent.

Host-side (numpy) redesign of scene/dataset_readers.py:
- readColmapSceneInfo (:269-314): read sparse model, build per-image camera
  infos with FoVs from intrinsics, llffhold split (every Nth image held out,
  llffhold=83, arguments/__init__.py:59).
- getNerfppNorm (:112-128): scene extent = 1.1 * max distance of any camera
  center from their average (the `cameras_extent` / spatial_lr_scale).
- Manhattan world alignment applied to points and extrinsics
  (dataset_readers.py:96-104, 241-246) via utils/manhattan.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from pcp_tpu.io import colmap
from pcp_tpu.io.ply import fetch_point_cloud, store_point_cloud
from pcp_tpu.utils.graphics import focal2fov, qvec_to_rotmat
from pcp_tpu.utils.manhattan import (
    apply_man_trans_extrinsics,
    apply_man_trans_points,
)


@dataclass
class CameraInfo:
    """One view: COLMAP extrinsics (x_cam = R x + t) + pinhole intrinsics."""

    uid: int                 # contiguous index (embedding id)
    image_id: int            # COLMAP image id
    R: np.ndarray            # (3, 3) world->cam rotation
    t: np.ndarray            # (3,)  world->cam translation
    fovx: float
    fovy: float
    width: int
    height: int
    image_name: str
    image_path: Optional[str] = None
    point3d_ids: Optional[np.ndarray] = None  # for partition visibility
    camera_id: Optional[int] = None  # original COLMAP intrinsic id
    alpha_bg: Optional[np.ndarray] = None  # RGBA composite bg (Blender)

    @property
    def center(self) -> np.ndarray:
        return -self.R.T @ self.t

    def focal(self) -> Tuple[float, float]:
        import math

        fx = self.width / (2.0 * math.tan(self.fovx * 0.5))
        fy = self.height / (2.0 * math.tan(self.fovy * 0.5))
        return fx, fy


@dataclass
class SceneInfo:
    cameras: List[CameraInfo]
    points: np.ndarray       # (N, 3)
    colors: np.ndarray       # (N, 3) in [0, 1]
    extent: float
    ply_path: Optional[str] = None
    intrinsics: Optional[dict] = None  # COLMAP id -> colmap.Camera (global)
    test_camera_uids: Optional[List[int]] = None  # explicit split (Blender)


def nerfpp_extent(centers: np.ndarray) -> float:
    """1.1 * max ||center - mean|| (getNerfppNorm, dataset_readers.py:112-128)."""
    if len(centers) == 0:
        return 1.0
    avg = centers.mean(axis=0)
    dist = np.linalg.norm(centers - avg, axis=1)
    return float(dist.max() * 1.1) or 1.0


def _camera_fovs(cam: colmap.Camera) -> Tuple[float, float]:
    fx, fy = cam.focal
    return focal2fov(fx, cam.width), focal2fov(fy, cam.height)


def load_colmap_scene(
    path: str,
    images_dir: str = "images",
    man_trans: Optional[np.ndarray] = None,
    keep_point_ids: bool = False,
) -> SceneInfo:
    """Read `<path>/sparse/0` (or `<path>` if it is the model dir directly).

    Mirrors readColmapSceneInfo (dataset_readers.py:269-314) + the partition
    reader's point3D_ids retention (shen_data_read.py:24,59).
    """
    model_dir = path
    for cand in (os.path.join(path, "sparse", "0"), os.path.join(path, "sparse")):
        if os.path.isdir(cand) and _has_model(cand):
            model_dir = cand
            break
    cams, imgs, pts = colmap.read_model(model_dir)

    xyz = pts.xyz.astype(np.float64)
    rgb = pts.rgb.astype(np.float32) / 255.0
    if man_trans is not None:
        xyz = apply_man_trans_points(xyz, man_trans)

    # Optional pre-converted PLY next to the model (fetchPly/storePly flow,
    # shen_data_read.py:182-198): keep the bin as source of truth here.
    infos: List[CameraInfo] = []
    img_root = os.path.join(path, images_dir)
    for uid, iid in enumerate(sorted(imgs.keys())):
        im = imgs[iid]
        cam = cams[im.camera_id]
        R = qvec_to_rotmat(im.qvec)
        t = np.asarray(im.tvec, np.float64)
        if man_trans is not None:
            R, t = apply_man_trans_extrinsics(R, t, man_trans)
        fovx, fovy = _camera_fovs(cam)
        p3d = None
        if keep_point_ids and im.point3D_ids is not None:
            p3d = im.point3D_ids[im.point3D_ids >= 0]
        infos.append(
            CameraInfo(
                uid=uid,
                image_id=iid,
                R=R,
                t=t,
                fovx=fovx,
                fovy=fovy,
                width=cam.width,
                height=cam.height,
                image_name=im.name,
                image_path=os.path.join(img_root, im.name),
                point3d_ids=p3d,
                camera_id=im.camera_id,
            )
        )

    extent = nerfpp_extent(np.stack([c.center for c in infos]) if infos else np.zeros((0, 3)))
    return SceneInfo(
        cameras=infos,
        points=xyz.astype(np.float32),
        colors=rgb,
        extent=extent,
        intrinsics=dict(cams),
    )


def _has_model(d: str) -> bool:
    return any(
        os.path.exists(os.path.join(d, "cameras" + ext)) for ext in (".bin", ".txt")
    )


def split_train_test(
    cameras: List[CameraInfo],
    eval_split: bool,
    llffhold: int = 83,
    explicit_test: Optional[List[int]] = None,
) -> Tuple[List[CameraInfo], List[CameraInfo]]:
    """Every llffhold-th view is test (dataset_readers.py:285-290), unless
    the dataset ships an explicit split (Blender transforms_test.json —
    readNerfSyntheticInfo, dataset_readers.py:488-495)."""
    if not eval_split:
        return list(cameras), []
    if explicit_test is not None:
        tset = set(explicit_test)
        train = [c for c in cameras if c.uid not in tset]
        test = [c for c in cameras if c.uid in tset]
        return train, test
    train = [c for i, c in enumerate(cameras) if i % llffhold != 0]
    test = [c for i, c in enumerate(cameras) if i % llffhold == 0]
    return train, test


def ensure_input_ply(scene: SceneInfo, model_path: str) -> str:
    """Write `input.ply` under the model dir (Scene.__init__ behaviour,
    scene/__init__.py:50-56)."""
    os.makedirs(model_path, exist_ok=True)
    out = os.path.join(model_path, "input.ply")
    store_point_cloud(out, scene.points, (scene.colors * 255).astype(np.uint8))
    return out


__all__ = [
    "CameraInfo",
    "SceneInfo",
    "load_colmap_scene",
    "nerfpp_extent",
    "split_train_test",
    "ensure_input_ply",
    "fetch_point_cloud",
]
