"""Dense O(N * pixels) reference rasterizer for testing.

Replays the CUDA per-pixel compositing loop (forward.cu:261-374) literally in
numpy: global depth sort, sequential front-to-back alpha blending with the
exact skip/early-stop rules, restricted — like the tiled renderer — to pixels
whose tile is inside the Gaussian's tile rect. Slow by construction; used only
by tests as ground truth for ops/rasterize.py.
"""

from __future__ import annotations

import numpy as np

from pcp_tpu.ops.projection import TILE, preprocess
from pcp_tpu.ops.rasterize import ALPHA_MAX, ALPHA_MIN, T_EPS


def rasterize_dense(
    xyz, scales, quats, opacities, sh, viewmat, intrin, image_size,
    background, sh_degree,
):
    """Returns (image (H, W, 3), final_T (H, W)) as float32 numpy."""
    import jax.numpy as jnp

    prep = preprocess(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opacities), jnp.asarray(sh), jnp.asarray(viewmat),
        intrin, image_size, sh_degree,
    )
    means2d = np.asarray(prep["means2d"])
    conics = np.asarray(prep["conics"])
    rgb = np.asarray(prep["rgb"])
    opac = np.asarray(prep["opacity"])
    rect = np.asarray(prep["rect"])
    depths = np.asarray(prep["depths"])
    visible = np.asarray(prep["visible"])

    w, h = int(image_size[0]), int(image_size[1])
    order = np.argsort(np.where(visible, depths, np.inf), kind="stable")

    img = np.zeros((h, w, 3), np.float32)
    final_t = np.ones((h, w), np.float32)
    bg = np.asarray(background, np.float32).reshape(3)

    for py in range(h):
        for px in range(w):
            t = 1.0
            c = np.zeros(3, np.float32)
            tx, ty = px // TILE, py // TILE
            for g in order:
                if not visible[g]:
                    break
                x0, y0, x1, y1 = rect[g]
                if not (x0 <= tx < x1 and y0 <= ty < y1):
                    continue
                dx = px - means2d[g, 0]
                dy = py - means2d[g, 1]
                a, b, cc = conics[g]
                power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
                if power > 0.0:
                    continue
                alpha = min(ALPHA_MAX, opac[g] * np.exp(power))
                if alpha < ALPHA_MIN:
                    continue
                t_after = t * (1.0 - alpha)
                if t_after < T_EPS:
                    break
                c += rgb[g] * alpha * t
                t = t_after
            img[py, px] = c + t * bg
            final_t[py, px] = t
    return img, final_t
