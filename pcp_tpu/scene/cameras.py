"""Device-side camera representation + ground-truth image loading.

Replaces scene/cameras.py (Camera/SimpleCamera) and utils/camera_utils.py
(loadCam resolution logic). A Camera here is a small host object that can
emit the jnp arrays the rasterizer needs; ground-truth images are loaded
lazily and downscaled with the reference's rules (>1.6K auto-downscale
warning path, camera_utils.py:21-50).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from pcp_tpu.ops.projection import CameraIntrin
from pcp_tpu.scene.dataset import CameraInfo
from pcp_tpu.utils.graphics import world_to_view


@dataclass
class Camera:
    """A renderable view at a concrete resolution."""

    uid: int
    viewmat: np.ndarray      # (4, 4) world->camera
    fx: float
    fy: float
    width: int
    height: int
    image_name: str = ""
    gt_image: Optional[np.ndarray] = None  # (H, W, 3) float32 in [0, 1]

    @property
    def center(self) -> np.ndarray:
        return -self.viewmat[:3, :3].T @ self.viewmat[:3, 3]

    @property
    def tan_fov(self) -> Tuple[float, float]:
        return 0.5 * self.width / self.fx, 0.5 * self.height / self.fy


def _resolve_scale(info: CameraInfo, resolution: int) -> float:
    """camera_utils.loadCam:21-50: -1 = auto (cap long side at 1600),
    1/2/4/8 = explicit divisors."""
    if resolution in (1, 2, 4, 8):
        return float(resolution)
    if resolution == -1:
        if info.width > 1600:
            return info.width / 1600.0
        return 1.0
    return float(resolution) if resolution > 0 else 1.0


def from_info(
    info: CameraInfo, resolution: int = 1, load_image: bool = True
) -> Camera:
    scale = _resolve_scale(info, resolution)
    w = int(round(info.width / scale))
    h = int(round(info.height / scale))
    fx = w / (2.0 * math.tan(info.fovx * 0.5))
    fy = h / (2.0 * math.tan(info.fovy * 0.5))
    gt = None
    if load_image and info.image_path:
        gt = load_image_file(info.image_path, (w, h), alpha_bg=info.alpha_bg)
    return Camera(
        uid=info.uid,
        viewmat=world_to_view(info.R, info.t).astype(np.float32),
        fx=fx,
        fy=fy,
        width=w,
        height=h,
        image_name=info.image_name,
        gt_image=gt,
    )


def load_image_file(
    path: str, size: Tuple[int, int], alpha_bg: Optional[np.ndarray] = None
) -> np.ndarray:
    """(W, H) -> (H, W, 3) float32 in [0,1] (PILtoTorch, general_utils.py).

    With ``alpha_bg``, RGBA inputs are alpha-composited over that background
    (NeRF-synthetic ground truth, dataset_readers.py:470-477)."""
    from PIL import Image as PILImage

    img = PILImage.open(path)
    if alpha_bg is not None and img.mode in ("RGBA", "LA", "PA", "P"):
        rgba = img.convert("RGBA")
        if rgba.size != size:
            rgba = rgba.resize(size, PILImage.LANCZOS)
        arr = np.asarray(rgba, np.float32) / 255.0
        bg = np.asarray(alpha_bg, np.float32).reshape(1, 1, 3)
        return arr[..., :3] * arr[..., 3:4] + bg * (1.0 - arr[..., 3:4])
    img = img.convert("RGB")
    if img.size != size:
        img = img.resize(size, PILImage.LANCZOS)
    return np.asarray(img, np.float32) / 255.0


def camera_device_arrays(cam: Camera):
    """(viewmat jnp (4,4), CameraIntrin) for ops.rasterize."""
    import jax.numpy as jnp

    viewmat = jnp.asarray(cam.viewmat, jnp.float32)
    intrin = CameraIntrin(
        fx=jnp.float32(cam.fx),
        fy=jnp.float32(cam.fy),
        cx=jnp.float32(cam.width / 2.0),
        cy=jnp.float32(cam.height / 2.0),
    )
    return viewmat, intrin
