"""Is d(ssim)/d(image) itself wrong on TPU? Compare against CPU on the
same fixed random image pair (no rasterizer involved).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dbg_ssim_grad.py
(and once more with JAX_PLATFORMS unset / cpu config for the CPU row —
this script runs both: it computes on the default backend and on CPU
via explicit device placement.)
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from pcp_tpu.utils.loss import ssim

H, W = 304, 400
rng = np.random.default_rng(0)
img = rng.random((3, H, W), np.float32)
gt = rng.random((3, H, W), np.float32)

f = jax.jit(jax.value_and_grad(lambda x, y: 1.0 - ssim(x, y)))

print("backend:", jax.default_backend())
v, g = f(jnp.asarray(img), jnp.asarray(gt))
g = np.asarray(g)
print(f"tpu/default: val={float(v):.6f} grad p50={np.median(np.abs(g)):.3e} "
      f"max={np.abs(g).max():.3e} finite={np.isfinite(g).all()}")

cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    v2, g2 = jax.jit(jax.value_and_grad(lambda x, y: 1.0 - ssim(x, y)))(
        jnp.asarray(img), jnp.asarray(gt))
g2 = np.asarray(g2)
print(f"cpu:         val={float(v2):.6f} grad p50={np.median(np.abs(g2)):.3e} "
      f"max={np.abs(g2).max():.3e}")
print("val diff:", abs(float(v) - float(v2)),
      "grad maxdiff:", np.abs(g - g2).max())
