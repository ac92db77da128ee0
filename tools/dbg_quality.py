"""Debug the quality-run divergence: train block 00 briefly on CPU and
introspect loss trajectory, densify stats, opacity distribution, and
the effect of the appearance net on the L1."""
import sys, os
sys.path.insert(0, "/root/repo")
import jax
if not os.environ.get("PCP_DBG_TPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import argparse
from pcp_tpu.cli.common import (add_model_args, add_optim_args,
                                add_pipeline_args, config_from_args)
from pcp_tpu.scene import load_scene
from pcp_tpu.scene import cameras as cam_mod
from pcp_tpu.scene.dataset import split_train_test
from pcp_tpu.train.loop import init_state
from pcp_tpu.train.step import make_train_step, make_densify_step
from pcp_tpu.models import gaussians as G

src = "/tmp/quality_scene/model/split_result/visible/00/partition_00"
p = argparse.ArgumentParser()
add_model_args(p); add_optim_args(p); add_pipeline_args(p)
args = p.parse_args([
    "-s", src, "-m", "/tmp/dbg_block00b", "--iterations", "600",
    "--capacity", "16384", "--max_per_tile", "512", "--resolution", "1",
    "--densify_from_iter", "60", "--densification_interval", "30",
    "--densify_until_iter", "7500",
])
cfg = config_from_args(args)
scene = load_scene(cfg.model.source_path,
                   white_background=cfg.model.white_background,
                   eval_split=cfg.model.eval)
train_infos, test_infos = split_train_test(
    scene.cameras, cfg.model.eval, cfg.model.llffhold,
    explicit_test=getattr(scene, "test_camera_uids", None))
cams = [cam_mod.from_info(i, cfg.model.resolution) for i in train_infos]
w, h = cams[0].width, cams[0].height
print(f"{len(cams)} cams {w}x{h}, extent={scene.extent:.3f}, "
      f"{scene.points.shape[0]} pts")

key = jax.random.PRNGKey(0)
state = init_state(scene, cfg, (w, h), key)
ocfg = cfg.optim
step_fn = make_train_step(ocfg, (w, h), scene.extent,
                          use_appearance=cfg.pipeline.use_appearance)
densify_fn = make_densify_step(ocfg, scene.extent)

import random
rng = random.Random(0)
order = []
for it in range(1, 121):
    if not order:
        order = list(range(len(cams)))
        rng.shuffle(order)
    cam = cams[order.pop()]
    sh_degree = min(cfg.model.sh_degree, (it - 1) // 1000)
    viewmat, intrin = cam_mod.camera_device_arrays(cam)
    state, metrics = step_fn(state, viewmat, intrin,
                             jnp.asarray(cam.gt_image), jnp.int32(cam.uid),
                             jnp.zeros(3), sh_degree)
    if it % 10 == 0 or it == 1:
        ga = np.asarray(state.stats["grad_accum"])
        dn = np.asarray(state.stats["denom"])
        alive = np.asarray(state.alive)
        avg = ga[alive] / np.maximum(dn[alive], 1)
        op = np.asarray(G.opacity_act(state.params["opacity"]))[alive, 0]
        print(f"it {it:4d} loss {float(metrics['loss']):.4f} "
              f"alive {alive.sum()} gradavg p50={np.median(avg):.2e} "
              f"p90={np.percentile(avg,90):.2e} max={avg.max():.2e} "
              f"op p50={np.median(op):.3f} min={op.min():.4f} "
              f"npairs {int(metrics['n_pairs'])}")
    if 60 <= it <= 7500 and it % 30 == 0:
        key, dkey = jax.random.split(key)
        before = int(np.asarray(state.alive).sum())
        state = densify_fn(state, dkey, it > ocfg.opacity_reset_interval)
        after = int(np.asarray(state.alive).sum())
        print(f"  densify @{it}: {before} -> {after}")
