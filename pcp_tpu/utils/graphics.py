"""Camera/projection math.

Parity with the reference's utils/graphics_utils.py:30-77 (getWorld2View2,
getProjectionMatrix, focal2fov/fov2focal) but written array-module agnostic so
the same functions serve the numpy data layer and jnp compute paths.

Conventions (COLMAP / reference):
- world-to-camera: x_cam = R @ x_world + t  with (R, t) from COLMAP qvec/tvec.
- the reference stores transforms row-major *transposed* (torch convention of
  right-multiplying row vectors); we keep standard column-vector 4x4 matrices
  and transpose only at the rasterizer boundary if ever needed.
- NDC z in [0, 1] after perspective divide (matches reference
  getProjectionMatrix z_sign=+1, zfar/(zfar-znear) terms).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "focal2fov",
    "fov2focal",
    "qvec_to_rotmat",
    "rotmat_to_qvec",
    "world_to_view",
    "projection_matrix",
    "camera_center_from_rt",
]


def focal2fov(focal: float, pixels: float) -> float:
    """Focal length (px) -> full field of view (rad). graphics_utils.py:77."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov2focal(fov: float, pixels: float) -> float:
    """Full field of view (rad) -> focal length (px). graphics_utils.py:74."""
    return pixels / (2.0 * math.tan(fov / 2.0))


def qvec_to_rotmat(qvec):
    """COLMAP [w, x, y, z] quaternion -> 3x3 rotation (numpy).

    Semantics of colmap_loader.py:31-45 / read_write_model qvec2rotmat.
    """
    w, x, y, z = np.asarray(qvec, dtype=np.float64)
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def rotmat_to_qvec(R) -> np.ndarray:
    """3x3 rotation -> COLMAP [w, x, y, z] quaternion.

    Same eigen-decomposition construction as COLMAP's rotmat2qvec
    (read_write_model.py semantics); deterministic sign: w >= 0.
    """
    R = np.asarray(R, dtype=np.float64)
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec = -qvec
    return qvec


def world_to_view(R, t, translate=None, scale: float = 1.0) -> np.ndarray:
    """4x4 world->camera matrix with optional recenter/rescale of the camera
    center, mirroring getWorld2View2 (graphics_utils.py:37-48).

    `R`, `t` are the COLMAP extrinsics (x_cam = R x + t). The reference passes
    R transposed through its pipeline; here we take raw COLMAP (R, t).
    """
    R = np.asarray(R, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    Rt = np.eye(4)
    Rt[:3, :3] = R
    Rt[:3, 3] = t
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return Rt


def camera_center_from_rt(R, t) -> np.ndarray:
    """Camera center in world coordinates: -R^T t (cameras.py:70 semantics)."""
    R = np.asarray(R, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    return -R.T @ t


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective with z mapped to [0, 1].

    Parity with getProjectionMatrix (graphics_utils.py:51-71): symmetric
    frustum from the tangents of the half-FoVs, z_sign = +1.
    """
    tanx = math.tan(fovx * 0.5)
    tany = math.tan(fovy * 0.5)
    P = np.zeros((4, 4))
    P[0, 0] = 1.0 / tanx
    P[1, 1] = 1.0 / tany
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P
