"""Train CLI — `python -m pcp_tpu.cli.train -s <scene> -m <out>`.

Reference: train.py:245-274 (same core flags). Trains one scene/block.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    from pcp_tpu.cli.common import (
        add_model_args,
        add_optim_args,
        add_pipeline_args,
        config_from_args,
        man_trans_from_config,
    )

    add_model_args(p)
    add_optim_args(p)
    add_pipeline_args(p)
    p.add_argument("--test_iterations", nargs="+", type=int,
                   default=[7_000, 30_000])
    p.add_argument("--save_iterations", nargs="+", type=int,
                   default=[7_000, 30_000])
    p.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    p.add_argument("--start_checkpoint", type=str, default=None)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ip", type=str, default="127.0.0.1",
                   help="viewer socket host (train.py:252); 'none' disables")
    p.add_argument("--port", type=int, default=6009)
    p.add_argument("--disable_viewer", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="write a jax.profiler trace under the model dir")
    args = p.parse_args(argv)

    from pcp_tpu.scene import load_scene
    from pcp_tpu.train.loop import train_scene
    from pcp_tpu.utils.general import safe_state

    cfg = config_from_args(args)
    cfg.test_iterations = args.test_iterations
    cfg.save_iterations = args.save_iterations
    cfg.checkpoint_iterations = args.checkpoint_iterations
    cfg.start_checkpoint = args.start_checkpoint
    cfg.seed = args.seed

    safe_state(args.seed)
    scene = load_scene(
        cfg.model.source_path, images_dir=cfg.model.images,
        white_background=cfg.model.white_background,
        eval_split=cfg.model.eval,
        man_trans=man_trans_from_config(cfg.model),
    )
    print(f"training {cfg.model.source_path}: {len(scene.cameras)} cameras, "
          f"{len(scene.points)} points, extent {scene.extent:.2f}")

    state = None
    start_iter = 0
    if cfg.start_checkpoint:
        import jax

        from pcp_tpu.scene import cameras as cam_mod
        from pcp_tpu.train import checkpoint as ckpt
        from pcp_tpu.train.loop import init_state

        cams0 = cam_mod.from_info(scene.cameras[0], cfg.model.resolution,
                                  load_image=False)
        template = init_state(scene, cfg, (cams0.width, cams0.height),
                              jax.random.PRNGKey(cfg.seed))
        state, start_iter = ckpt.load(cfg.start_checkpoint, template)
        print(f"resumed from {cfg.start_checkpoint} @ iter {start_iter}")

    viewer = None
    if not args.disable_viewer and args.ip != "none":
        try:
            from pcp_tpu.viewer import NetworkGUI

            viewer = NetworkGUI(args.ip, args.port)
        except OSError as e:
            print(f"viewer socket unavailable ({e}); continuing headless")

    train_scene(
        scene, cfg,
        log_fn=None if args.quiet else print,
        state=state, start_iter=start_iter,
        viewer=viewer, profile=args.profile, debug=args.debug,
    )
    if viewer is not None:
        viewer.close()
    print("training complete:", cfg.model.model_path)


if __name__ == "__main__":
    main()
