"""pcp_tpu.eval — render + metrics drivers (render.py / metrics.py parity):
color-corrected PSNR / SSIM / LPIPS, results.json + per_view.json artifacts.
"""

from pcp_tpu.eval.metrics import evaluate_dir, evaluate_images  # noqa: F401
