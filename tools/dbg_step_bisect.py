"""Bisect the TPU train-step garbage: run ONE train_step_impl on block 00
under (a) jit with donation (production config), (b) jit without donation,
(c) no-appearance variants of both. Healthy probe-grad p50 is ~1e-4.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dbg_step_bisect.py
"""
import os, sys, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from pcp_tpu.scene import load_scene
from pcp_tpu.scene import cameras as cam_mod
from pcp_tpu.train.loop import init_state
from pcp_tpu.train import step as S
from pcp_tpu.train.config import OptimConfig, TrainRunConfig, ModelConfig, PipelineConfig

src = "/tmp/quality_scene/model/split_result/visible/00/partition_00"
scene = load_scene(src, white_background=False, eval_split=False)
cam = cam_mod.from_info(scene.cameras[0], 1)
w, h = cam.width, cam.height
ocfg = OptimConfig(capacity=16384, max_per_tile=512)
cfg = TrainRunConfig(model=ModelConfig(source_path=src, model_path="/tmp/x"),
                     optim=ocfg, pipeline=PipelineConfig())
state0 = init_state(scene, cfg, (w, h), jax.random.PRNGKey(0))
state0 = jax.device_get(state0)  # host copy so each variant starts fresh

viewmat, intrin = cam_mod.camera_device_arrays(cam)
gt = jnp.asarray(cam.gt_image)
bg = jnp.zeros(3, jnp.float32)
extent = jnp.float32(scene.extent)

print("backend:", jax.default_backend())


def run(name, donate, use_app):
    kw = dict(donate_argnums=(0,)) if donate else {}
    @functools.partial(jax.jit, static_argnames=("sh_degree",), **kw)
    def train_step(state, viewmat, intrin, gt, view_idx, background, extent,
                   sh_degree):
        return S.train_step_impl(
            state, viewmat, intrin, gt, view_idx, background, extent,
            ocfg=ocfg, image_size=(w, h), sh_degree=sh_degree,
            use_appearance=use_app)
    st = jax.device_put(state0)
    if not use_app:
        st = S.TrainState(st.params, None, st.opt_g, None, st.alive, st.stats)
    st2, metrics = train_step(st, viewmat, intrin, gt, jnp.int32(0), bg,
                              extent, 0)
    ga = np.asarray(st2.stats["grad_accum"])
    alive = np.asarray(st2.alive)
    p50 = np.median(ga[alive]); mx = ga.max()
    print(f"{name:24s} loss={float(metrics['loss']):.6f} "
          f"gradaccum p50={p50:.3e} max={mx:.3e} "
          f"finite={np.isfinite(ga).all()}")





# ---- loss-term bisect: L1 only vs L1+SSIM, straight through rasterize ----
from pcp_tpu.models import gaussians as G
from pcp_tpu.train.step import render_gaussians
from pcp_tpu.utils.loss import l1_loss, ssim


def run_loss(name, with_ssim, use_pallas=None):
    st = jax.device_put(state0)
    from pcp_tpu.ops.rasterize import rasterize

    def loss_fn(params, probe):
        opac = G.opacity_act(params["opacity"])[:, 0] * st.alive.astype(
            jnp.float32)
        image, aux = rasterize(
            params["xyz"], G.scaling_act(params["scaling"]),
            params["rotation"], opac, G.sh_coeffs(params),
            viewmat, intrin, (w, h), bg, 0,
            max_per_tile=ocfg.max_per_tile,
            max_pairs=ocfg.pairs_per_gaussian * params["xyz"].shape[0],
            means2d_offset=probe, use_pallas=use_pallas)
        loss = 0.8 * l1_loss(image, gt, None)
        if with_ssim:
            chw = lambda x: jnp.transpose(x, (2, 0, 1))
            loss = loss + 0.2 * (1.0 - ssim(chw(image), chw(gt)))
        return loss

    probe0 = jnp.zeros((state0.params["xyz"].shape[0], 2), jnp.float32)
    loss, gp = jax.jit(jax.value_and_grad(loss_fn, argnums=1))(
        st.params, probe0)
    gn = np.asarray(jnp.linalg.norm(gp * jnp.asarray([0.5 * w, 0.5 * h]),
                                    axis=-1))
    alive = np.asarray(st.alive)
    print(f"{name:24s} loss={float(loss):.6f} "
          f"gnorm p50={np.median(gn[alive]):.3e} max={gn.max():.3e} "
          f"finite={np.isfinite(gn).all()}")


run_loss("l1_only_pallas", False, True)
run_loss("l1_ssim_pallas", True, True)
run_loss("l1_only_xla", False, False)
run_loss("l1_ssim_xla", True, False)
