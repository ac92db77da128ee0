"""Training losses: L1, L2, and windowed SSIM.

Parity with the reference's utils/loss_utils.py (l1/l2 :17-21; SSIM with an
11x11 sigma=1.5 separable Gaussian window, per-channel convolution, C1/C2 for
dynamic range 1 :23-63). Implemented with depthwise lax convolutions so the
whole loss jits and fuses.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax


def l1_loss(pred, target, valid_mask=None):
    """Mean |pred - target|; with ``valid_mask`` (H, W) the mean runs over
    valid pixels only (pad-and-mask mixed-resolution support)."""
    if valid_mask is None:
        return jnp.abs(pred - target).mean()
    m = valid_mask.astype(pred.dtype)[..., None]
    n = jnp.maximum(m.sum() * pred.shape[-1], 1.0)
    return jnp.sum(jnp.abs(pred - target) * m) / n


def l2_loss(pred, target):
    return ((pred - target) ** 2).mean()


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float):
    import jax
    import numpy as np

    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    # Materialise outside any active trace: under jit, np->jnp constants
    # become trace-bound tracers in recent JAX, and caching/reuse across
    # traces leaks them (UnexpectedTracerError).
    with jax.ensure_compile_time_eval():
        return jnp.asarray(g)


def _blur_1d(img, axis: int, window_size: int, sigma: float):
    """Zero-padded 'same' Gaussian blur along one axis as a fused
    window_size-tap shift-and-add (pure VPU work, fp32 throughout)."""
    g = _gaussian_window(window_size, sigma)
    half = window_size // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (half, half)
    x = jnp.pad(img, pad)
    n = img.shape[axis]
    out = None
    for k in range(window_size):
        sl = lax.slice_in_dim(x, k, k + n, axis=axis)
        term = g[k] * sl
        out = term if out is None else out + term
    return out


def _depthwise_blur(img, window_size: int, sigma: float):
    """Separable depthwise Gaussian filter. img: (C, H, W). Exact
    zero-padded 'same' semantics.

    fp32 is load-bearing, not a nicety: sigma = blur(x^2) - mu^2 cancels
    ~1e-3 signals, and computing the blur with TPU-default bf16 matmul
    operands turns the SSIM gradient into garbage (measured on-chip:
    |g| inflated 10-1000x, train loss diverges). The shift-and-add form
    is exact fp32 on the VPU and cheaper than an fp32 dense banded matmul
    (11 taps vs an H- or W-sized contraction on the MXU).
    """
    x = _blur_1d(img, 1, window_size, sigma)
    return _blur_1d(x, 2, window_size, sigma)


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5,
         valid_mask=None):
    """Mean SSIM over a (C, H, W) image pair in [0, 1].

    Same constants as loss_utils.py:55-63: C1 = 0.01^2, C2 = 0.03^2; Gaussian
    window normalized to sum 1; 'same' padding (the reference pads by
    window//2 as well).

    With ``valid_mask`` (H, W): inputs are zeroed outside the mask and the
    SSIM map is averaged over valid pixels only. Because the convs zero-pad,
    this equals computing SSIM at the native (unpadded) resolution exactly.
    """
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    if valid_mask is not None:
        m = valid_mask.astype(jnp.float32)[None]
        img1 = img1 * m
        img2 = img2 * m
    mu1 = _depthwise_blur(img1, window_size, sigma)
    mu2 = _depthwise_blur(img2, window_size, sigma)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window_size, sigma) - mu1_mu2
    C1 = 0.01 ** 2
    C2 = 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if valid_mask is not None:
        m = valid_mask.astype(jnp.float32)[None]
        n = jnp.maximum(m.sum() * ssim_map.shape[0], 1.0)
        return jnp.sum(ssim_map * m) / n
    return ssim_map.mean()


def photometric_loss(pred, raw_pred, target, lambda_dssim: float = 0.2):
    """(1-λ)·L1(pred, gt) + λ·(1-SSIM(raw_pred, gt)).

    The reference computes L1 on the appearance-decoupled image and SSIM on
    the raw render (train.py:111-117); pass pred == raw_pred when appearance
    decoupling is off.
    """
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(raw_pred, target)
    )
