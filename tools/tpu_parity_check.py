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
    # Measured floor is now ~5e-7 img / 3e-6 grad: the 2.8e-3 deviation
    # round 2 blamed on "Mosaic's exp()" was actually the XLA composite's
    # bf16-default blend einsum; with HIGHEST pinned there the two paths
    # agree to fp32 round-off. Keep a loose gate — logic bugs are O(1).
    ok = img_err < 1e-4 and g_err < 1e-3

    step_ok = check_train_step()
    print("PARITY OK" if (ok and step_ok) else "PARITY FAIL")
    return 0 if (ok and step_ok) else 1


def check_train_step() -> bool:
    """Full train_step TPU-vs-CPU: loss + densify grad stats must agree.

    This is the gate that catches TPU-only numeric regressions in the
    composed step (L1+SSIM+appearance+adam). History: bf16 default matmul
    precision made the SSIM backward produce 10-1000x inflated probe
    gradients on TPU only — every CPU test stayed green while real-chip
    training diverged. The fix pins HIGHEST precision in utils/loss.ssim
    and ops/projection.preprocess; this check keeps it pinned.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from pcp_tpu.models import gaussians as G
    from pcp_tpu.ops.projection import CameraIntrin
    from pcp_tpu.train import step as S
    from pcp_tpu.train.config import OptimConfig

    rng = np.random.default_rng(7)
    n_pts, cap = 900, 2048
    w, h = 200, 160
    pts = np.stack(
        [rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
         rng.uniform(2.5, 7, n_pts)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (n_pts, 3)).astype(np.float32)
    gcfg = G.GaussianConfig(sh_degree=3, capacity=cap)
    params, alive = G.create_from_pcd(pts, cols, gcfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    alive = np.asarray(alive)
    ocfg = OptimConfig(capacity=cap, max_per_tile=256)

    from pcp_tpu.models.appearance import init_appearance

    app = jax.tree_util.tree_map(
        np.asarray, init_appearance(jax.random.PRNGKey(0), (w, h)))

    from pcp_tpu.train import optim

    viewmat = np.eye(4, dtype=np.float32)
    intrin_np = (100.0, 100.0, w / 2.0, h / 2.0)
    gt = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)

    from pcp_tpu.ops import rasterize as R

    def run_on(device):
        with jax.default_device(device):
            st = S.TrainState(
                params=jax.device_put(params), app=jax.device_put(app),
                opt_g=optim.init_adam(jax.device_put(params)),
                opt_a=optim.init_adam(jax.device_put(app)),
                alive=jax.device_put(alive),
                stats=G.init_densify_stats(cap),
            )
            intrin = CameraIntrin(*(jnp.float32(v) for v in intrin_np))

            @functools.partial(jax.jit, static_argnames=("sh_degree",))
            def step(state, vm, intr, g, vi, bgc, ext, sh_degree):
                return S.train_step_impl(
                    state, vm, intr, g, vi, bgc, ext, ocfg=ocfg,
                    image_size=(w, h), sh_degree=sh_degree,
                    use_appearance=True)

            st2, metrics = step(
                st, jnp.asarray(viewmat), intrin, jnp.asarray(gt),
                jnp.int32(0), jnp.zeros(3), jnp.float32(4.0), 0)
            ga = np.asarray(st2.stats["grad_accum"])
            return float(metrics["loss"]), ga

    # XLA composite on both devices: the pallas-vs-xla gate above already
    # pins the Mosaic kernel; this leg pins everything AROUND it.
    R.FORCE_XLA = True
    try:
        l_tpu, ga_tpu = run_on(jax.devices()[0])
        l_cpu, ga_cpu = run_on(jax.devices("cpu")[0])
    finally:
        R.FORCE_XLA = False
    al = alive
    p50_t = float(np.median(ga_tpu[al]))
    p50_c = float(np.median(ga_cpu[al]))
    loss_err = abs(l_tpu - l_cpu)
    # p50 of the accumulated probe-grad norms; the bf16 bug inflated this
    # 1000x, so a 1.5x gate has enormous margin over fp noise (~1.001x).
    ratio = max(p50_t, 1e-12) / max(p50_c, 1e-12)
    print(f"train-step tpu-vs-cpu: loss {l_tpu:.6f} vs {l_cpu:.6f} "
          f"(|d|={loss_err:.2e}), gradstat p50 {p50_t:.3e} vs {p50_c:.3e} "
          f"(ratio {ratio:.3f})")
    return loss_err < 5e-3 and 1 / 1.5 < ratio < 1.5


if __name__ == "__main__":
    sys.exit(main())
