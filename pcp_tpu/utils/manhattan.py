"""Manhattan-world alignment transforms.

Parity with the reference's utils/manhattan_utils.py:3-29: build a 4x4 world
rotation from threejs-style position/rotation strings (angles negated because
threejs counts counterclockwise negative; rotation composed Rz @ Ry @ Rx and
then transposed into the matrix), plus the cloudcompare 9-number rotation
format documented at arguments/__init__.py:64-66.
"""

from __future__ import annotations

import numpy as np

__all__ = ["create_man_trans", "get_man_trans", "man_trans_from_cc"]


def _axis_rot(angle_deg: float, axis: int) -> np.ndarray:
    a = np.deg2rad(-angle_deg)
    c, s = np.cos(a), np.sin(a)
    if axis == 0:
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == 1:
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def create_man_trans(position, rotation) -> np.ndarray:
    """threejs pos (3,) + euler rot degrees (3,) -> 4x4 Manhattan transform."""
    rot = _axis_rot(rotation[2], 2) @ _axis_rot(rotation[1], 1) @ _axis_rot(rotation[0], 0)
    man = np.zeros((4, 4))
    man[:3, :3] = rot.T
    man[:3, 3] = np.asarray(position, dtype=np.float64)
    man[3, 3] = 1.0
    return man


def get_man_trans(pos: str, rot: str):
    """Parse 'x y z' strings as the reference CLI does (manhattan_utils.py:25-29).
    Returns None when either string is empty (flag unset)."""
    if not pos or not rot:
        return None
    position = [float(v) for v in pos.split()]
    rotation = [float(v) for v in rot.split()]
    return create_man_trans(position, rotation)


def man_trans_from_cc(pos: str, rot: str) -> np.ndarray:
    """cloudcompare platform format: rot is 9 numbers (row-major 3x3)
    (arguments/__init__.py:64-66, render_and_eval.sh:2)."""
    position = np.array([float(v) for v in pos.split()])
    R = np.array([float(v) for v in rot.split()]).reshape(3, 3)
    man = np.zeros((4, 4))
    man[:3, :3] = R
    man[:3, 3] = position
    man[3, 3] = 1.0
    return man


def apply_man_trans_points(points: np.ndarray, man_trans: np.ndarray) -> np.ndarray:
    """Rotate/translate world points (dataset_readers.py:241-246 semantics)."""
    return points @ man_trans[:3, :3].T + man_trans[:3, 3]


def apply_man_trans_extrinsics(R: np.ndarray, t: np.ndarray, man_trans: np.ndarray):
    """Re-express a COLMAP extrinsic in the Manhattan-aligned world:
    W2C' = W2C @ man_trans^-1 (dataset_readers.py:96-104 semantics).
    Returns (R', t')."""
    W2C = np.eye(4)
    W2C[:3, :3] = R
    W2C[:3, 3] = t
    W2nC = W2C @ np.linalg.inv(man_trans)
    return W2nC[:3, :3], W2nC[:3, 3]
