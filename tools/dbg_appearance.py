"""Mechanism diagnostic for appearance decoupling (VERDICT r2 item 4).

Trains appearance-ON vs OFF on a tiny per-view-jittered synthetic scene
(CPU-friendly) and answers three questions the end-to-end A/B cannot:

  1. Does the learned per-view map actually TRACK the applied jitter?
     (per-train-view mean map ratio vs the views' true exposure ratio)
  2. Does ON recover the underlying radiance field better than OFF?
     (raw renders vs the TRUE un-jittered images — the quantity the
     appearance net exists to protect; reference
     scene/ptgs/appearance_network.py:7-17, train.py:111-117)
  3. Is the ON deficit (if any) an optimization drag or a wiring bug?

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/dbg_appearance.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W = int(os.environ.get("DBG_APP_W", "96"))
H = int(os.environ.get("DBG_APP_H", "64"))
N_PTS = int(os.environ.get("DBG_APP_PTS", "300"))
N_CAMS = int(os.environ.get("DBG_APP_CAMS", "14"))
JITTER = float(os.environ.get("DBG_APP_JITTER", "0.5"))
FIELD = float(os.environ.get("DBG_APP_FIELD", "0.35"))
CAPACITY = int(os.environ.get("DBG_APP_CAP", "1024"))
ITERS = int(os.environ.get("DBG_APP_ITERS", "1500"))
# A/B-cadence knobs (question 3): QUALITY_r03_small's appearance A/B ran
# densify every 100 + opacity reset 3000 over 6000 iters and measured ON
# LOSING; the default diagnostic cadence (every 200, no reset) measures ON
# winning. These let the same tiny scene reproduce the A/B cadence to
# isolate which schedule interaction flips the sign.
DENS_INT = int(os.environ.get("DBG_APP_DENSIFY_INT", "200"))
RESET_INT = int(os.environ.get("DBG_APP_RESET_INT", "0"))  # 0 = never
# DBG_APP_ATTEN=1: jitter gains <= 1 only (the sigmoid map's design
# domain — see tests/synthetic.py jitter_atten_only)
ATTEN = os.environ.get("DBG_APP_ATTEN", "0") == "1"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pcp_tpu.models.appearance import decouple_appearance
    from pcp_tpu.scene import cameras as cam_mod
    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train.config import (ModelConfig, OptimConfig,
                                      PipelineConfig, TrainRunConfig)
    from pcp_tpu.train.loop import train_scene
    from pcp_tpu.train.step import render_gaussians
    from pcp_tpu.utils.image import color_correct, psnr
    from tests.synthetic import (look_at_w2c, render_true_scene,
                                 write_synthetic_scene)

    root = (f"/tmp/dbg_app_scene_{W}x{H}_{N_PTS}"
            + ("_atten" if ATTEN else ""))
    rng = np.random.default_rng(4)
    if not os.path.isdir(os.path.join(root, "sparse")):
        os.makedirs(root, exist_ok=True)
    true = write_synthetic_scene(
        root, rng, n_points=N_PTS, n_cams=N_CAMS, W=W, H=H,
        appearance_jitter=JITTER, appearance_field=FIELD,
        jitter_atten_only=ATTEN)
    xyz, rgb, scales, quats, opac = true

    scene = load_colmap_scene(root)
    cams = [cam_mod.from_info(i, 1) for i in scene.cameras]
    # held-out views: every 5th (the rest train)
    test_ids = {c.uid for i, c in enumerate(cams) if i % 5 == 0}
    fx = 0.9 * W

    def true_image(cam):
        # reconstruct the pose used by write_synthetic_scene
        i = cam.uid
        ang = 2 * np.pi * i / N_CAMS
        pos = np.array([5.0 * np.cos(ang), 5.0 * np.sin(ang),
                        1.5 + 0.5 * np.sin(3 * ang)])
        R, t = look_at_w2c(pos, (0.0, 0.0, 0.0))
        return render_true_scene(xyz, rgb, scales, quats, opac,
                                 R, t, fx, fx, W, H)

    results = {}
    states = {}
    for use_app in (True, False):
        cfg = TrainRunConfig(
            model=ModelConfig(source_path=root, model_path=f"/tmp/dbg_app_"
                              f"{'on' if use_app else 'off'}",
                              resolution=1, sh_degree=2),
            optim=OptimConfig(iterations=ITERS, capacity=CAPACITY,
                              max_per_tile=256,
                              densify_from_iter=300,
                              densification_interval=DENS_INT,
                              densify_until_iter=int(ITERS * 0.75),
                              opacity_reset_interval=(RESET_INT or
                                                      10 * ITERS)),
            pipeline=PipelineConfig(use_appearance=use_app),
            test_iterations=[], save_iterations=[], seed=0,
        )
        # train only on train views
        train_infos = [i for i in scene.cameras
                       if i.uid not in test_ids]
        import dataclasses as dc
        sc = dc.replace(scene, cameras=train_infos)
        state = train_scene(sc, cfg, log_fn=None)
        states[use_app] = state

        bg = jnp.zeros(3)
        raw_psnr, cc_psnr = [], []
        for cam in cams:
            if cam.uid not in test_ids:
                continue
            vm, intr = cam_mod.camera_device_arrays(cam)
            img, _ = render_gaussians(
                state.params, state.alive, vm, intr, (W, H), bg, 2,
                max_per_tile=256)
            img = np.clip(np.asarray(img), 0, 1)
            t_img = true_image(cam)
            raw_psnr.append(float(psnr(jnp.asarray(img)[None],
                                       jnp.asarray(t_img)[None])[0]))
            ccr = np.clip(np.asarray(color_correct(
                jnp.asarray(img), jnp.asarray(t_img))), 0, 1)
            cc_psnr.append(float(psnr(jnp.asarray(ccr)[None],
                                      jnp.asarray(t_img)[None])[0]))
        results[use_app] = (float(np.mean(raw_psnr)),
                            float(np.mean(cc_psnr)))
        print(f"appearance={'ON ' if use_app else 'OFF'} vs TRUE images: "
              f"raw PSNR {results[use_app][0]:.2f}  "
              f"color-corrected {results[use_app][1]:.2f}  "
              f"alive {int(np.asarray(state.alive).sum())} "
              f"(cadence: densify/{DENS_INT}, reset/{RESET_INT or 'never'}, "
              f"{ITERS} iters)")

    # question 1: do the maps track the jitter? compare two train views'
    # mean map ratio to their GT/true brightness ratio
    st = states[True]
    tr = [c for c in cams if c.uid not in test_ids][:6]
    bg = jnp.zeros(3)
    print("\nper-view map vs actual jitter (train views):")
    for cam in tr:
        vm, intr = cam_mod.camera_device_arrays(cam)
        img, _ = render_gaussians(st.params, st.alive, vm, intr, (W, H),
                                  bg, 2, max_per_tile=256)
        _, mapping = decouple_appearance(img, st.app, jnp.int32(cam.uid))
        t_img = true_image(cam)
        gt = np.asarray(cam.gt_image)
        mask = t_img.mean(-1) > 0.02
        jit_ratio = float((gt.mean(-1)[mask] / np.maximum(
            t_img.mean(-1)[mask], 1e-3)).mean())
        print(f"  uid {cam.uid:2d}: mean map {float(np.asarray(mapping).mean()):.3f}  "
              f"true jitter gain {jit_ratio:.3f}")


if __name__ == "__main__":
    main()
