"""Image metrics: PSNR, MSE, and multinerf-style color correction.

Parity with the reference's utils/image_utils.py (psnr :20-22, color_correct
:26-69 — the reference itself implements color_correct in JAX; here it is a
single batched jnp least-squares solve instead of a python channel loop).
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(img1, img2):
    """Per-image mean squared error over all but the leading axis."""
    d = (img1 - img2) ** 2
    return d.reshape(d.shape[0], -1).mean(axis=1)


def psnr(img1, img2):
    """PSNR in dB for images in [0, 1]. Leading axis is batch
    (image_utils.py:20-22 semantics; scalar inputs: add a batch axis)."""
    m = mse(img1, img2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(m, 1e-12)))


def _quadratic_basis(img_mat):
    """Quadratic color expansion: for each channel c, products
    img[c] * img[c:], then the linear channels, then a bias column.
    Column order matches image_utils.py:43-48."""
    num_channels = img_mat.shape[-1]
    cols = []
    for c in range(num_channels):
        cols.append(img_mat[:, c : c + 1] * img_mat[:, c:])
    cols.append(img_mat)
    cols.append(jnp.ones_like(img_mat[:, :1]))
    return jnp.concatenate(cols, axis=-1)


def color_correct(img, ref, num_iters: int = 5, eps: float = 0.5 / 255):
    """Warp `img` to match the colors of `ref` (multinerf algorithm).

    Repeatedly solves a masked least-squares system mapping a quadratic
    expansion of img's colors onto ref's, ignoring saturated pixels, and
    re-applies the warp (image_utils.py:26-69 semantics). Pure jnp; uses a
    regularized normal-equations solve instead of np.linalg.lstsq so the whole
    routine jits.
    """
    if img.shape[-1] != ref.shape[-1]:
        raise ValueError("img and ref channel counts must match")
    import jax

    with jax.default_matmul_precision("highest"):
        return _color_correct_body(img, ref, num_iters, eps)


def _color_correct_body(img, ref, num_iters, eps):
    # fp32 matmuls are load-bearing: the A^T A normal equations square the
    # pixel sums, and TPU-default bf16 operands corrupt the solve.
    num_channels = img.shape[-1]
    img_mat = img.reshape(-1, num_channels).astype(jnp.float32)
    ref_mat = ref.reshape(-1, num_channels).astype(jnp.float32)

    def is_unclipped(z):
        return (z >= eps) & (z <= 1.0 - eps)

    mask0 = is_unclipped(img_mat)
    for _ in range(num_iters):
        a_mat = _quadratic_basis(img_mat)
        warps = []
        for c in range(num_channels):
            b = ref_mat[:, c]
            mask = mask0[:, c] & is_unclipped(img_mat[:, c]) & is_unclipped(b)
            ma = jnp.where(mask[:, None], a_mat, 0.0)
            mb = jnp.where(mask, b, 0.0)
            # Tikhonov-regularized normal equations (stable enough in f32 for
            # the well-conditioned quadratic color basis).
            ata = ma.T @ ma + 1e-6 * jnp.eye(a_mat.shape[-1], dtype=ma.dtype)
            atb = ma.T @ mb
            warps.append(jnp.linalg.solve(ata, atb))
        warp = jnp.stack(warps, axis=-1)
        img_mat = jnp.clip(a_mat @ warp, 0.0, 1.0)
    return img_mat.reshape(img.shape)
