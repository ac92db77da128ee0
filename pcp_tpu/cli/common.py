"""Shared argparse wiring mirroring the reference ParamGroup flag names
(arguments/__init__.py:47-114)."""

from __future__ import annotations

import argparse
import dataclasses

from pcp_tpu.train.config import (
    ModelConfig,
    OptimConfig,
    PipelineConfig,
    TrainRunConfig,
)
from pcp_tpu.utils.manhattan import get_man_trans, man_trans_from_cc


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-s", "--source_path", type=str, default="")
    p.add_argument("-m", "--model_path", type=str, default="")
    p.add_argument("-i", "--images", type=str, default="images")
    p.add_argument("-r", "--resolution", type=int, default=-1)
    p.add_argument("-w", "--white_background", action="store_true")
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--llffhold", type=int, default=83)
    p.add_argument("--manhattan", action="store_true")
    p.add_argument("--platform", type=str, default="")
    p.add_argument("--pos", type=str, default="0 0 0")
    p.add_argument("--rot", type=str, default="0 0 0")
    p.add_argument("--m_region", type=int, default=3)
    p.add_argument("--n_region", type=int, default=3)
    p.add_argument("--extend_rate", type=float, default=0.2)
    p.add_argument("--visible_rate", type=float, default=0.25)
    p.add_argument("--data_device", type=str, default="device",
                   choices=["device", "host"],
                   help="GT-image residency during training (reference "
                        "data_device: cuda/cpu)")


def add_optim_args(p: argparse.ArgumentParser) -> None:
    d = OptimConfig()
    for f in dataclasses.fields(OptimConfig):
        flag = "--" + f.name
        if f.type == "bool" or isinstance(getattr(d, f.name), bool):
            p.add_argument(flag, action="store_true")
        else:
            p.add_argument(flag, type=type(getattr(d, f.name)),
                           default=getattr(d, f.name))


def add_pipeline_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--convert_SHs_python", action="store_true")
    p.add_argument("--compute_cov3D_python", action="store_true")
    p.add_argument("--debug", action="store_true",
                   help="check loss finiteness every step; on first NaN dump "
                        "step inputs to nan_snapshot_<it>.npz and abort "
                        "(reference --detect_anomaly + snapshot dumps)")
    p.add_argument("--no_appearance", action="store_true")
    p.add_argument("--share_appearance", action="store_true",
                   help="fleet: ONE appearance net/embeddings replicated "
                        "across blocks with psum-reduced grads (fixes the "
                        "reference's per-block exposure divergence / merge "
                        "seams; default keeps reference per-block nets)")


def config_from_args(args) -> TrainRunConfig:
    mc = ModelConfig(
        sh_degree=args.sh_degree, source_path=args.source_path,
        model_path=args.model_path, images=args.images,
        resolution=args.resolution, white_background=args.white_background,
        eval=args.eval, llffhold=args.llffhold, manhattan=args.manhattan,
        platform=args.platform, pos=args.pos, rot=args.rot,
        m_region=args.m_region, n_region=args.n_region,
        extend_rate=args.extend_rate, visible_rate=args.visible_rate,
        data_device=args.data_device,
    )
    oc = OptimConfig(
        **{
            f.name: getattr(args, f.name)
            for f in dataclasses.fields(OptimConfig)
            if hasattr(args, f.name)
        }
    )
    pc = PipelineConfig(
        convert_SHs_python=getattr(args, "convert_SHs_python", False),
        compute_cov3D_python=getattr(args, "compute_cov3D_python", False),
        debug=getattr(args, "debug", False),
        use_appearance=not getattr(args, "no_appearance", False),
        share_appearance=getattr(args, "share_appearance", False),
    )
    return TrainRunConfig(model=mc, optim=oc, pipeline=pc)


def man_trans_from_config(mc: ModelConfig):
    """utils/manhattan_utils semantics: cc = cloudcompare 9-number rot,
    tj = threejs pos/rot strings (arguments/__init__.py:64-66)."""
    if not mc.manhattan:
        return None
    if mc.platform == "cc":
        return man_trans_from_cc(mc.pos, mc.rot)
    return get_man_trans(mc.pos, mc.rot)
