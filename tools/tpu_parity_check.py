"""Real-chip parity check: fused (Mosaic) Pallas composite vs XLA composite.

The pytest suite runs on a forced CPU backend (Pallas in interpret mode), so
Mosaic-only regressions are invisible to it. This script runs BOTH paths on
the actual TPU and compares images and gradients.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_parity_check.py
Exit 0 on parity, 1 on mismatch. Also invoked by
tests/test_tpu_parity.py when PCP_TPU_TESTS=1.
"""

from __future__ import annotations

import sys

import numpy as np

W, H = 128, 96


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("no TPU backend; nothing to check")
        return 0

    from pcp_tpu.ops.projection import CameraIntrin
    from pcp_tpu.ops.rasterize import rasterize

    rng = np.random.default_rng(0)
    n = 500
    xyz = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(2, 6, n)], -1).astype(np.float32)
    scales = rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    sh = rng.uniform(-0.3, 0.8, (n, 1, 3)).astype(np.float32)
    viewmat = jnp.eye(4)
    intrin = CameraIntrin(fx=jnp.float32(100.0), fy=jnp.float32(100.0),
                          cx=jnp.float32(W / 2), cy=jnp.float32(H / 2))
    bg = jnp.zeros(3)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss_with(use_pallas):
        def f(xyz_):
            img, _ = rasterize(
                xyz_, jnp.asarray(scales), jnp.asarray(quats),
                jnp.asarray(opac), jnp.asarray(sh), viewmat, intrin,
                (W, H), bg, 0, max_per_tile=256, use_pallas=use_pallas,
            )
            return jnp.mean(jnp.abs(img - gt)), img
        (l, img), g = jax.value_and_grad(f, has_aux=True)(jnp.asarray(xyz))
        return np.asarray(img), np.asarray(g), float(l)

    img_p, g_p, l_p = loss_with(True)
    img_x, g_x, l_x = loss_with(False)

    img_err = np.abs(img_p - img_x).max()
    g_err = np.abs(g_p - g_x).max() / max(np.abs(g_x).max(), 1e-12)
    print(f"pallas-vs-xla on {jax.default_backend()}: "
          f"img max err {img_err:.2e}, grad rel err {g_err:.2e}, "
          f"loss {l_p:.6f} vs {l_x:.6f}")
    # Tolerance floor: Mosaic's exp() is a faster approximation than
    # XLA:TPU's (measured ~2.8e-3 image / 1.4e-2 grad deviation through
    # alpha = opacity*exp(power), identical across scan variants and matmul
    # precisions). Logic bugs show up as O(1) errors; gate above the
    # transcendental floor. (SGD noise dwarfs this during training.)
    ok = img_err < 1e-2 and g_err < 5e-2
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
