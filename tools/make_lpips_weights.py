"""Produce an LPIPS weight bundle (.npz) for pcp_tpu.eval.lpips.

Two modes:

- REAL: convert user-supplied torch checkpoints (torchvision AlexNet
  state_dict + richzhang LPIPS v0.1 ``alex.pth`` linear heads), read
  torch-free via eval/torch_pth:
      python tools/make_lpips_weights.py --alexnet alexnet.pth \
          --lins alex.pth --out lpips_alex.npz
- SYNTHETIC (``--synthetic``): no pretrained weights are downloadable in
  this environment (zero egress, no torchvision), so this emits a
  reproducible random-but-sane AlexNet + positive linear heads. It is a
  PLUMBING STAND-IN: the resulting metric is a valid perceptual-style
  distance (0 for identical images, monotone-ish in distortion) but its
  VALUES ARE NOT comparable to published LPIPS numbers. The bundle carries
  a ``synthetic=1`` marker array; downstream reports must label it.

Reference: lpipsPyTorch/__init__.py:6-30 (alex backbone + v0.1 heads).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synthetic_bundle(seed: int = 0) -> dict:
    from pcp_tpu.eval.lpips import _ALEX_CONVS, _CONV_IDX  # noqa: F401

    rng = np.random.default_rng(seed)
    out = {}
    cin = 3
    chans = []
    for i, (cout, k, _s, _p) in enumerate(_ALEX_CONVS):
        # He-scaled filters so activations neither die nor blow up
        std = np.sqrt(2.0 / (cin * k * k))
        out[f"conv{i}_w"] = (
            rng.standard_normal((k, k, cin, cout)).astype(np.float32) * std)
        out[f"conv{i}_b"] = np.zeros(cout, np.float32)
        chans.append(cout)
        cin = cout
    for i, c in enumerate(chans):
        out[f"lin{i}_w"] = np.abs(
            rng.standard_normal(c).astype(np.float32)) / c
    out["synthetic"] = np.int32(1)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--alexnet", help="torchvision AlexNet .pth")
    ap.add_argument("--lins", help="richzhang LPIPS v0.1 alex.pth heads")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.synthetic:
        np.savez(args.out, **synthetic_bundle(args.seed))
        print(f"SYNTHETIC lpips bundle -> {args.out} (plumbing stand-in; "
              f"values not comparable to published LPIPS)")
        return
    if not (args.alexnet and args.lins):
        ap.error("--synthetic or both --alexnet and --lins required")
    from pcp_tpu.eval.lpips import convert_torch_weights

    convert_torch_weights(args.out, alexnet_pth=args.alexnet,
                          lpips_pth=args.lins)
    print(f"converted real weights -> {args.out}")


if __name__ == "__main__":
    main()
