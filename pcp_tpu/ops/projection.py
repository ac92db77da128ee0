"""Per-Gaussian preprocess: project, EWA 2D covariance, conic, radii, color.

Vectorised-over-N jnp redesign of the reference rasterizer's per-Gaussian
preprocess stage (submodules/diff-gaussian-rasterization/cuda_rasterizer/
forward.cu:118-256 `preprocessCUDA`, :74-113 `computeCov2D`, :20-71
`computeColorFromSH`). One thread per Gaussian in CUDA becomes one fused XLA
program over (N, ...) arrays — the natural TPU mapping (pure VPU work, no
gather/scatter).

Conventions (COLMAP / reference):
  viewmat (4,4): world -> camera, x_cam = R x_w + t, camera looks down +z.
  Pixel coords: x right, y down; pixel centers at integer + 0.5 like
  ndc2Pix (auxiliary.h:41-44).
"""

from __future__ import annotations

import os as _os
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

# Lossless tight tile rects (ellipse AABB at the alpha >= 1/255 iso-contour)
# instead of the reference's circumscribed 3-sigma circle. A/B: PCP_TIGHT_RECT=0.
TIGHT_RECT = _os.environ.get("PCP_TIGHT_RECT", "1") == "1"

from pcp_tpu.utils.general import quat_to_rotmat
from pcp_tpu.utils.sh import eval_sh_color

NEAR_PLANE = 0.2  # in_frustum near clip (auxiliary.h:128-134)
LOW_PASS = 0.3    # 2D covariance dilation (forward.cu:108-112)
TILE = 16         # BLOCK_X/BLOCK_Y (config.h:16-17)


class CameraIntrin(NamedTuple):
    """Pinhole intrinsics as traced scalars (shapes stay static)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray


def preprocess(
    xyz: jnp.ndarray,          # (N, 3) world means
    scales: jnp.ndarray,       # (N, 3) activated scales
    quats: jnp.ndarray,        # (N, 4) unnormalised quaternions
    opacities: jnp.ndarray,    # (N,)   activated opacities
    sh: jnp.ndarray,           # (N, K, 3) SH coefficients
    viewmat: jnp.ndarray,      # (4, 4) world->camera
    intrin: CameraIntrin,
    image_size,                # (W, H) static ints
    sh_degree: int,
    tan_fov=None,              # (tanx, tany); default from intrinsics
    means2d_offset: jnp.ndarray = None,  # (N, 2) zero probe for densify grads
) -> Dict[str, jnp.ndarray]:
    """Returns per-Gaussian screen-space quantities.

    Keys: means2d (N,2) px, depths (N,), conics (N,3) [a,b,c] of the inverse
    2D covariance, radii (N,) px (0 = culled), rgb (N,3), opacity (N,),
    rect (N,4) int32 tile bounds [x0,y0,x1,y1) clamped to the tile grid.

    All geometry matmuls run at HIGHEST precision: TPU matmuls default to
    bf16 operands, and bf16 in ``xyz @ rot.T`` alone is multiple PIXELS of
    projection error at scene scale (cov2d/conic suffer similarly). These
    are tiny-K batched matmuls — fp32 costs nothing measurable, and keeps
    the TPU forward bit-comparable to the CPU backend.
    """
    with jax.default_matmul_precision("highest"):
        return _preprocess_body(
            xyz, scales, quats, opacities, sh, viewmat, intrin, image_size,
            sh_degree, tan_fov, means2d_offset,
        )


def _preprocess_body(
    xyz, scales, quats, opacities, sh, viewmat, intrin, image_size,
    sh_degree, tan_fov, means2d_offset,
):
    w, h = int(image_size[0]), int(image_size[1])
    n = xyz.shape[0]
    rot = viewmat[:3, :3]
    trn = viewmat[:3, 3]

    # All the "matmuls" below (p_view, J@rot, T Sigma T^T, campos) are
    # tiny-K contractions expanded into explicit mul-adds: exact fp32 on
    # the VPU with no MXU pass. TPU-default bf16 matmul operands cost
    # ~pixels of projection error, and fp32 MXU (HIGHEST) measured ~7 ms
    # per step in layout shuffles for these shapes.
    x0, x1, x2 = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    p_view = jnp.stack(
        [rot[i, 0] * x0 + rot[i, 1] * x1 + rot[i, 2] * x2 + trn[i]
         for i in range(3)], axis=-1)               # (N, 3) camera space
    depths = p_view[:, 2]
    in_front = depths > NEAR_PLANE

    # --- projection (ndc2Pix-equivalent focal form) ---
    zinv = 1.0 / jnp.where(in_front, depths, 1.0)
    mx = p_view[:, 0] * zinv * intrin.fx + intrin.cx
    my = p_view[:, 1] * zinv * intrin.fy + intrin.cy
    means2d = jnp.stack([mx, my], axis=-1)
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    # --- EWA: cov2D = J W cov3D W^T J^T + LOW_PASS I (computeCov2D) ---
    if tan_fov is None:
        tanx = 0.5 * w / intrin.fx
        tany = 0.5 * h / intrin.fy
    else:
        tanx, tany = tan_fov
    lim_x = 1.3 * tanx
    lim_y = 1.3 * tany
    tx = jnp.clip(p_view[:, 0] * zinv, -lim_x, lim_x) * depths
    ty = jnp.clip(p_view[:, 1] * zinv, -lim_y, lim_y) * depths

    z = depths
    # J rows (forward.cu:95-99); J = [[j00, 0, j02], [0, j11, j12]]
    j00 = intrin.fx / z
    j02 = -intrin.fx * tx / (z * z)
    j11 = intrin.fy / z
    j12 = -intrin.fy * ty / (z * z)
    # T = J @ rot, expanded over J's 4 nonzeros: (N, 2, 3) as 6 vectors
    T0 = [j00 * rot[0, k] + j02 * rot[2, k] for k in range(3)]
    T1 = [j11 * rot[1, k] + j12 * rot[2, k] for k in range(3)]
    # cov2D = T Sigma T^T with Sigma = L L^T, L = R(q) * diag(s)
    # (covariance_from_scaling_rotation): let M = T @ L (N, 2, 3), then
    # a = |M0|^2, c = |M1|^2, b = M0 . M1 — 18 mul-adds per Gaussian.
    R = quat_to_rotmat(quats)                       # (N, 3, 3)
    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
    sk = (s0, s1, s2)
    M0 = [sk[k] * (T0[0] * R[:, 0, k] + T0[1] * R[:, 1, k]
                   + T0[2] * R[:, 2, k]) for k in range(3)]
    M1 = [sk[k] * (T1[0] * R[:, 0, k] + T1[1] * R[:, 1, k]
                   + T1[2] * R[:, 2, k]) for k in range(3)]
    a = M0[0] * M0[0] + M0[1] * M0[1] + M0[2] * M0[2] + LOW_PASS
    c = M1[0] * M1[0] + M1[1] * M1[1] + M1[2] * M1[2] + LOW_PASS
    b = M0[0] * M1[0] + M0[1] * M1[1] + M0[2] * M1[2]

    det = a * c - b * b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # radius = ceil(3 sigma_max) via eigenvalues (forward.cu:195-200)
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # --- SH -> clamped RGB (computeColorFromSH) ---
    campos = -jnp.stack(
        [rot[0, j] * trn[0] + rot[1, j] * trn[1] + rot[2, j] * trn[2]
         for j in range(3)])
    dirs = xyz - campos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    rgb = eval_sh_color(sh_degree, sh, dirs)

    # --- tile rect ---
    # The reference bounds every splat by the circumscribed circle of its
    # 3-sigma ellipse (getRect, auxiliary.h:46-59). Both the CUDA kernel
    # (forward.cu:329-338) and ours skip any sample with alpha < 1/255, so
    # every pair outside {q(d) <= q_cap}, q_cap = min(9, 2 ln(255 op)), has
    # EXACTLY zero contribution and gradient. TIGHT_RECT therefore bounds
    # by that ellipse's axis-aligned box instead — per-axis half-width
    # sqrt(q_cap * Sigma_xx/yy) — which is output-lossless but cuts pair
    # count ~10-30% (more on real scenes full of low-opacity survivors);
    # every downstream stage (sort, gather, kernel, scatter) scales with it.
    tiles_x = (w + TILE - 1) // TILE
    tiles_y = (h + TILE - 1) // TILE
    if TIGHT_RECT:
        q_cap = jnp.minimum(
            9.0, 2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1.0 + 1e-6))
        )
        rx = jnp.sqrt(q_cap * a) + 0.5   # half-pixel cushion vs fp boundary
        ry = jnp.sqrt(q_cap * c) + 0.5
    else:
        rx = ry = radius
    x0 = jnp.clip(((means2d[:, 0] - rx) / TILE).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(((means2d[:, 1] - ry) / TILE).astype(jnp.int32), 0, tiles_y)
    x1 = jnp.clip(
        ((means2d[:, 0] + rx + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_x
    )
    y1 = jnp.clip(
        ((means2d[:, 1] + ry + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_y
    )

    # Opacity below 1/255 can never contribute (renderCUDA skips alpha <
    # 1/255, forward.cu:329-338, and alpha <= opacity), so culling here is
    # semantics-preserving and keeps dead capacity-padding slots out of the
    # binning budget.
    visible = (
        in_front
        & det_ok
        & ((x1 - x0) * (y1 - y0) > 0)
        & (opacities > 1.0 / 255.0)
    )
    radii = jnp.where(visible, radius, 0.0)
    rect = jnp.stack(
        [
            jnp.where(visible, x0, 0),
            jnp.where(visible, y0, 0),
            jnp.where(visible, x1, 0),
            jnp.where(visible, y1, 0),
        ],
        axis=-1,
    )
    return {
        "means2d": means2d,
        "depths": depths,
        "conics": conic,
        "radii": radii,
        "rgb": rgb,
        "opacity": jnp.where(visible, opacities, 0.0),
        "rect": rect,
        "visible": visible,
    }
