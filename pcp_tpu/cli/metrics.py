"""Metrics CLI — `python -m pcp_tpu.cli.metrics -m <model_path> [...]`.

Reference: `python metrics.py -m <model_paths>` (metrics.py:188-195; this
version actually honours --model_paths — reference defect #4). Walks
<model>/<split>/ours_<tag>/ and writes results.json / per_view.json.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model_paths", nargs="+", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--no_color_correct", action="store_true")
    p.add_argument("--lpips_weights", default=None)
    args = p.parse_args(argv)

    from pcp_tpu.eval.lpips import make_lpips
    from pcp_tpu.eval.metrics import evaluate_dir

    if make_lpips(args.lpips_weights) is None:
        print(
            "[metrics] LPIPS weights not found (pass --lpips_weights or set "
            "PCP_LPIPS_WEIGHTS; produce the npz once with "
            "pcp_tpu.eval.lpips.convert_torch_weights on a machine with "
            "torchvision) — LPIPS will be reported as null"
        )

    for model in args.model_paths:
        split_dir = os.path.join(model, args.split)
        if not os.path.isdir(split_dir):
            print(f"[metrics] no {args.split}/ under {model}")
            continue
        for method in sorted(os.listdir(split_dir)):
            mdir = os.path.join(split_dir, method)
            if not os.path.isdir(os.path.join(mdir, "renders")):
                continue
            out = evaluate_dir(
                mdir,
                use_color_correct=not args.no_color_correct,
                lpips_weights=args.lpips_weights,
            )
            m = out["mean"]
            lp = f"{m['LPIPS']:.4f}" if m["LPIPS"] is not None else "n/a"
            print(
                f"{model} {method}: PSNR {m['PSNR']:.2f} "
                f"SSIM {m['SSIM']:.4f} LPIPS {lp}"
            )


if __name__ == "__main__":
    main()
