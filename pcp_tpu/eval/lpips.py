"""LPIPS (v0.1, AlexNet backbone) in Flax.

Reference: lpipsPyTorch/ — AlexNet features, unit-normalised per-channel
diffs, 1x1 linear heads, spatial mean, sum over layers.

This environment has no torchvision and no network egress, so pretrained
weights cannot be downloaded here. The architecture is complete; weights
load from either

- an ``.npz`` produced by ``convert_torch_weights``, or
- user-supplied torch ``.pth`` checkpoints read TORCH-FREE via the
  restricted unpickler in ``eval/torch_pth.py`` — pass one combined file
  or ``alexnet.pth,alex_lins.pth`` (comma-joined torchvision AlexNet +
  LPIPS linear-head files) to ``--lpips_weights``/``PCP_LPIPS_WEIGHTS``.

Without weights, ``lpips_fn`` returns None and the metrics driver reports
LPIPS as null — PSNR/SSIM (the primary reference metrics) are unaffected.
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


_CONV_IDX = [0, 3, 6, 8, 10]  # conv layer positions in alexnet.features


def _map_torch_weights(flat) -> dict:
    """Flat {torch key: array} -> this module's weight names. Accepts
    torchvision AlexNet keys (``features.N.weight``) and LPIPS head keys
    (``lin{i}.model.1.weight``, richzhang v0.1 naming) under any prefix."""
    out = {}
    for i, ci in enumerate(_CONV_IDX):
        wk = [k for k in flat if k.endswith(f"features.{ci}.weight")]
        bk = [k for k in flat if k.endswith(f"features.{ci}.bias")]
        if wk and bk:
            w = np.asarray(flat[wk[0]], np.float32)      # (O, I, kH, kW)
            out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
            out[f"conv{i}_b"] = np.asarray(flat[bk[0]], np.float32)
    for i in range(5):
        cands = [
            k for k in flat
            if k.endswith(f"lin{i}.model.1.weight")
            or k.endswith(f"lins.{i}.model.1.weight")
            or k == f"lin{i}.weight"
        ]
        if cands:
            out[f"lin{i}_w"] = np.asarray(
                flat[cands[0]], np.float32).reshape(-1)
    return out


_REQUIRED = [f"conv{i}_{s}" for i in range(5) for s in "wb"] + [
    f"lin{i}_w" for i in range(5)
]


def load_weights(path: str) -> Optional[dict]:
    """Load LPIPS weights from ``.npz`` or (comma-joined) torch ``.pth``
    files; returns None (with a warning) when incomplete/missing."""
    parts = [p for p in path.split(",") if p]
    if not all(os.path.exists(p) for p in parts):
        return None
    if len(parts) == 1 and not parts[0].endswith(".pth"):
        return dict(np.load(parts[0]))
    from pcp_tpu.eval.torch_pth import load_pth

    flat = {}
    for p in parts:
        flat.update(load_pth(p))
    weights = _map_torch_weights(flat)
    missing = [k for k in _REQUIRED if k not in weights]
    if missing:
        print(f"[lpips] {path}: missing weights {missing[:4]}... — "
              f"supply torchvision AlexNet AND the LPIPS linear heads")
        return None
    return weights


def make_lpips(weights_path: Optional[str] = None) -> Optional[Callable]:
    """Returns lpips(img1, img2) over (H,W,3) images in [0,1], or None if
    weights are unavailable."""
    path = weights_path or os.environ.get("PCP_LPIPS_WEIGHTS", "")
    if not path:
        return None
    data = load_weights(path)
    if data is None:
        return None
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


def convert_torch_weights(out_path: str, alexnet_pth: Optional[str] = None,
                          lpips_pth: Optional[str] = None) -> None:
    """Dump the ``.npz`` this module loads.

    TORCH-FREE when given the two ``.pth`` files (torchvision AlexNet
    state_dict + richzhang LPIPS v0.1 ``alex.pth`` linear heads) — they are
    read with ``eval/torch_pth.load_pth``. Without paths, falls back to
    downloading via torchvision/torch.hub (needs those packages + network)."""
    if alexnet_pth or lpips_pth:
        from pcp_tpu.eval.torch_pth import load_pth

        flat = {}
        for p in (alexnet_pth, lpips_pth):
            if p:
                flat.update(load_pth(p))
        out = _map_torch_weights(flat)
        missing = [k for k in _REQUIRED if k not in out]
        if missing:
            raise ValueError(f"incomplete LPIPS weights: missing {missing}")
        np.savez(out_path, **out)
        return

    import torch  # noqa
    import torchvision  # noqa

    alex = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
    out = {}
    for i, ci in enumerate(_CONV_IDX):
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
