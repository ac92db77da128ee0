"""Minimal TPU repro for the garbage means2d probe gradient seen in the
quality run: load block 00 of the quality scene, run ONE loss+grad eval at
400x304 through (a) Pallas composite, (b) XLA composite, both on TPU, and
(c) XLA on CPU as ground truth. Compare image, loss, and g_probe.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dbg_tpu_grad.py
"""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from pcp_tpu.models import gaussians as G
from pcp_tpu.scene import load_scene
from pcp_tpu.scene import cameras as cam_mod
from pcp_tpu.ops.rasterize import rasterize

src = "/tmp/quality_scene/model/split_result/visible/00/partition_00"
scene = load_scene(src, white_background=False, eval_split=False)
cam = cam_mod.from_info(scene.cameras[0], 1)
w, h = cam.width, cam.height
gcfg = G.GaussianConfig(sh_degree=3, capacity=16384)
params, alive = G.create_from_pcd(scene.points, scene.colors, gcfg)
params = jax.tree_util.tree_map(np.asarray, params)
alive = np.asarray(alive)
viewmat, intrin = cam_mod.camera_device_arrays(cam)
viewmat = np.asarray(viewmat)
gt = np.asarray(cam.gt_image)
bg = np.zeros(3, np.float32)


def loss_and_probe(use_pallas):
    def loss_fn(p, probe):
        scales = G.scaling_act(p["scaling"])
        quats = p["rotation"]
        ops = G.opacity_act(p["opacity"])[:, 0] * alive
        sh = G.sh_coeffs(p)
        img, aux = rasterize(
            p["xyz"], scales, quats, ops, sh, viewmat, intrin, (w, h),
            bg, 0, max_pairs=16 * p["xyz"].shape[0], max_per_tile=512,
            means2d_offset=probe, use_pallas=use_pallas)
        return jnp.mean(jnp.abs(img - gt)), img

    probe0 = jnp.zeros((params["xyz"].shape[0], 2), jnp.float32)
    (loss, img), grads = jax.jit(
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
    )(params, probe0)
    g_probe = grads[1]
    return (np.asarray(loss), np.asarray(img), np.asarray(g_probe))


backend = jax.default_backend()
print("backend:", backend)
rows = {}
for name, up in [("pallas", True), ("xla", False)]:
    if backend == "cpu" and up:
        continue
    loss, img, gp = loss_and_probe(up)
    gn = np.linalg.norm(gp, axis=-1)
    rows[name] = (loss, img, gp)
    print(f"{name:7s} loss={loss:.6f} img[min,max]=({img.min():.3f},"
          f"{img.max():.3f}) finite={np.isfinite(img).all()} "
          f"|gprobe| p50={np.median(gn[alive]):.3e} "
          f"p99={np.percentile(gn[alive],99):.3e} max={gn.max():.3e} "
          f"finite={np.isfinite(gp).all()}")
if len(rows) == 2:
    a, b = rows["pallas"], rows["xla"]
    print("img maxdiff:", np.abs(a[1] - b[1]).max(),
          "gprobe maxdiff:", np.abs(a[2] - b[2]).max())
