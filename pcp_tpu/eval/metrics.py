"""Metrics: color-corrected PSNR / SSIM / LPIPS over render/GT pairs.

Reference: metrics.py:29-186 `evaluate_single` — read renders/ + gt/, apply
the multinerf quadratic color solve per view (already JAX in the reference,
utils/image_utils.py:26-69), save renders_cc/, compute SSIM + PSNR + LPIPS,
write results.json and per_view.json. Fixes reference defects #4 (hardcoded
paths / live breakpoint / ignored argv, SURVEY §2.5).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from pcp_tpu.eval.lpips import make_lpips
from pcp_tpu.utils.image import color_correct, psnr
from pcp_tpu.utils.loss import ssim


def _load_image(path: str) -> np.ndarray:
    from PIL import Image as PILImage

    return np.asarray(PILImage.open(path).convert("RGB"), np.float32) / 255.0


def evaluate_images(
    renders: List[np.ndarray],
    gts: List[np.ndarray],
    names: Optional[List[str]] = None,
    *,
    use_color_correct: bool = True,
    lpips_weights: Optional[str] = None,
    save_cc_dir: Optional[str] = None,
) -> Dict:
    """Returns {"mean": {...}, "per_view": {...}} like results/per_view.json."""
    names = names or [f"{i:05d}.png" for i in range(len(renders))]
    lpips_fn = make_lpips(lpips_weights)
    rows = {}
    for name, render, gt in zip(names, renders, gts):
        r = jnp.asarray(render)
        g = jnp.asarray(gt)
        if use_color_correct:
            rc = jnp.clip(color_correct(r, g), 0.0, 1.0)
        else:
            rc = r
        if save_cc_dir:
            from PIL import Image as PILImage

            os.makedirs(save_cc_dir, exist_ok=True)
            PILImage.fromarray(
                (np.asarray(rc) * 255).astype(np.uint8)
            ).save(os.path.join(save_cc_dir, name))
        chw = lambda x: jnp.transpose(x, (2, 0, 1))
        s = float(ssim(chw(rc), chw(g)))
        if not (-1.0 <= s <= 1.0001):
            # Out of SSIM's mathematical range: observed once after a long
            # in-process pipeline (partition->train->render->metrics, CPU
            # backend) with per-view values like 11.1 — consistent with a
            # stale/aliased buffer, not with this formula. Recompute on
            # fresh host copies and surface the event loudly.
            rc2 = jnp.asarray(np.array(rc, np.float32))
            g2 = jnp.asarray(np.array(g, np.float32))
            s2 = float(ssim(chw(rc2), chw(g2)))
            print(f"[metrics] WARN: SSIM {s:.4f} out of [-1, 1] for {name}; "
                  f"recomputed on fresh buffers -> {s2:.4f}")
            s = s2
        rows[name] = {
            "PSNR": float(psnr(rc[None], g[None])[0]),
            "SSIM": s,
            "LPIPS": float(lpips_fn(rc, g)) if lpips_fn else None,
        }
    mean = {}
    for k in ("PSNR", "SSIM", "LPIPS"):
        vals = [v[k] for v in rows.values() if v[k] is not None]
        mean[k] = float(np.mean(vals)) if vals else None
    return {"mean": mean, "per_view": rows}


def evaluate_dir(
    method_dir: str,
    *,
    use_color_correct: bool = True,
    lpips_weights: Optional[str] = None,
) -> Dict:
    """Evaluate <method_dir>/{renders,gt}/ and write renders_cc/ +
    results.json + per_view.json beside them (metrics.py:58,108-111 layout)."""
    rdir = os.path.join(method_dir, "renders")
    gdir = os.path.join(method_dir, "gt")
    names = sorted(f for f in os.listdir(rdir) if f.lower().endswith((".png", ".jpg")))
    renders = [_load_image(os.path.join(rdir, f)) for f in names]
    gts = [_load_image(os.path.join(gdir, f)) for f in names]
    out = evaluate_images(
        renders, gts, names,
        use_color_correct=use_color_correct,
        lpips_weights=lpips_weights,
        save_cc_dir=os.path.join(method_dir, "renders_cc") if use_color_correct else None,
    )
    with open(os.path.join(method_dir, "results.json"), "w") as f:
        json.dump(out["mean"], f, indent=2)
    with open(os.path.join(method_dir, "per_view.json"), "w") as f:
        json.dump(out["per_view"], f, indent=2)
    return out
