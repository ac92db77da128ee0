"""LPIPS (v0.1, AlexNet backbone) in Flax.

Reference: lpipsPyTorch/ — AlexNet features, unit-normalised per-channel
diffs, 1x1 linear heads, spatial mean, sum over layers.

This environment has no torchvision and no network egress, so pretrained
weights cannot be downloaded here. The architecture is complete; weights
load from an .npz produced by ``convert_torch_weights`` (run once on any
machine with torchvision + the lpips linear weights, then ship the file).
Set ``PCP_LPIPS_WEIGHTS`` or pass ``weights_path``. Without weights,
``lpips_fn`` returns None and the metrics driver reports LPIPS as null —
PSNR/SSIM (the primary reference metrics) are unaffected.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

# AlexNet feature stages: (out_channels, kernel, stride, padding) per conv,
# with ReLU after each and maxpool(3,2) after stages 0, 1, 4.
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}
# channels tapped for LPIPS (relu1..relu5)
_TAP_CHANNELS = [64, 192, 384, 256, 256]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    import jax.lax as lax

    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)], dimension_numbers=dn
    )
    return y + b.reshape(1, 1, 1, -1)


def _maxpool(x, k=3, s=2):
    import jax.lax as lax

    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _alex_features(x, weights):
    """x: (N,H,W,3) in [-1,1] normalised; returns list of 5 tap activations."""
    x = (x - _SHIFT.reshape(1, 1, 1, 3)) / _SCALE.reshape(1, 1, 1, 3)
    taps = []
    for i, (c, k, s, p) in enumerate(_ALEX_CONVS):
        x = _conv(x, weights[f"conv{i}_w"], weights[f"conv{i}_b"], s, p)
        x = jnp.maximum(x, 0.0)
        taps.append(x)
        if i in _POOL_AFTER:
            x = _maxpool(x)
    return taps


def _normalize_tensor(x, eps=1e-10):
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def make_lpips(weights_path: Optional[str] = None) -> Optional[Callable]:
    """Returns lpips(img1, img2) over (H,W,3) images in [0,1], or None if
    weights are unavailable."""
    path = weights_path or os.environ.get("PCP_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    data = dict(np.load(path))
    weights = {k: jnp.asarray(v) for k, v in data.items()}

    def lpips(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        a = img1[None] * 2.0 - 1.0
        b = img2[None] * 2.0 - 1.0
        fa = _alex_features(a, weights)
        fb = _alex_features(b, weights)
        total = 0.0
        for i in range(5):
            d = (_normalize_tensor(fa[i]) - _normalize_tensor(fb[i])) ** 2
            lin = weights[f"lin{i}_w"].reshape(1, 1, 1, -1)  # (C,) 1x1 head
            total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
        return total

    return lpips


def convert_torch_weights(out_path: str) -> None:
    """Run on a machine WITH torchvision + lpips weights: dumps the npz this
    module loads. (Documented, not runnable in this offline environment.)"""
    import torch  # noqa
    import torchvision  # noqa

    alex = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
    out = {}
    conv_idx = [0, 3, 6, 8, 10]
    for i, ci in enumerate(conv_idx):
        w = alex[ci].weight.detach().numpy()      # (O, I, kH, kW)
        out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        out[f"conv{i}_b"] = alex[ci].bias.detach().numpy()
    url = (
        "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
        "master/lpips/weights/v0.1/alex.pth"
    )
    lin = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    for i in range(5):
        out[f"lin{i}_w"] = (
            lin[f"lin{i}.model.1.weight"].detach().numpy().reshape(-1)
        )
    np.savez(out_path, **out)
