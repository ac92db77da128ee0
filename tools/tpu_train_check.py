"""Real-chip training-quality check: train the synthetic scene a few
hundred iterations THROUGH THE MOSAIC KERNELS and verify PSNR climbs.

The pytest suite validates convergence on CPU (interpret mode); this is
the only check that exercises the compiled Mosaic path end to end for
QUALITY, not just parity tolerances (Mosaic's exp() deviates ~3e-3 from
XLA — this confirms it does not hurt optimization).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_train_check.py
"""

from __future__ import annotations

import sys
import tempfile


def main() -> int:
    import jax

    if jax.default_backend() == "cpu":
        print("no TPU backend; nothing to check")
        return 0

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "tests")
    from synthetic import write_synthetic_scene

    from pcp_tpu.scene import cameras as cam_mod, load_colmap_scene
    from pcp_tpu.train.config import (
        ModelConfig, OptimConfig, PipelineConfig, TrainRunConfig,
    )
    from pcp_tpu.train.loop import evaluate_cameras, init_state, train_scene

    with tempfile.TemporaryDirectory() as td:
        scene_dir = td + "/scene"
        write_synthetic_scene(scene_dir, np.random.default_rng(0),
                              n_points=120, n_cams=10)
        scene = load_colmap_scene(scene_dir)
        cfg = TrainRunConfig(
            model=ModelConfig(source_path=scene_dir, model_path=td + "/out",
                              resolution=1, sh_degree=3),
            optim=OptimConfig(iterations=400, capacity=256, max_per_tile=128,
                              densify_from_iter=100,
                              densification_interval=100,
                              opacity_reset_interval=10_000,
                              densify_until_iter=300),
            pipeline=PipelineConfig(use_appearance=False),
            test_iterations=[], save_iterations=[],
        )
        cams = [cam_mod.from_info(i, 1) for i in scene.cameras]
        bg = jnp.zeros(3)
        state0 = init_state(scene, cfg, (cams[0].width, cams[0].height),
                            jax.random.PRNGKey(0))
        before = evaluate_cameras(state0, cams[:2], 0, bg, cfg.optim)
        state = train_scene(scene, cfg, log_fn=None)
        after = evaluate_cameras(state, cams[:2], 3, bg, cfg.optim)
        print(f"PSNR {before['psnr']:.2f} -> {after['psnr']:.2f} "
              f"on {jax.default_backend()}")
        ok = after["psnr"] > before["psnr"] + 2.0 and after["psnr"] > 19.0
        print("TRAIN QUALITY OK" if ok else "TRAIN QUALITY FAIL")
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
