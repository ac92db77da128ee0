"""Config dataclasses mirroring the reference flag surface.

arguments/__init__.py:47-114 — ModelParams / OptimizationParams /
PipelineParams — reproduced as dataclasses; the CLI layer maps the same flag
names (-s/--source_path, -m/--model_path, --iterations, densify knobs,
partition knobs, Manhattan knobs). cfg_args persistence is JSON here, not the
reference's eval()-of-repr (a known defect, arguments/__init__.py:130).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ModelConfig:
    """ModelParams (arguments/__init__.py:47-79)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = False
    llffhold: int = 83
    # GT-image residency (arguments/__init__.py:57 data_device): "device"
    # keeps each train camera's image on the TPU after first use (the
    # reference default, cuda); "host" re-uploads per step (its cpu mode,
    # for scenes whose image set exceeds HBM headroom).
    data_device: str = "device"
    # partition knobs (legacy VastGaussian grid partitioner)
    m_region: int = 3
    n_region: int = 3
    extend_rate: float = 0.2
    visible_rate: float = 0.25
    # Manhattan alignment
    manhattan: bool = False
    platform: str = ""      # "cc" (cloudcompare) | "tj" (threejs)
    pos: str = "0 0 0"
    rot: str = "0 0 0"


@dataclass
class OptimConfig:
    """OptimizationParams (arguments/__init__.py:88-114)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 200
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 1000
    densify_until_iter: int = 30_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False
    appearance_embeddings_lr: float = 0.001
    appearance_network_lr: float = 0.001
    # TPU additions (static capacities; reference grows dynamically)
    capacity: int = 1 << 20          # per-block Gaussian slot cap (<= 6M ref)
    max_per_tile: int = 1024         # 0 = auto-size from sample-view loads
    # multi-level tile tables (binning.TileBinsLevels): most tiles in a
    # dense (num_tiles, tile_k_lo) base, heavier tiles in compact doubling
    # levels. tile_levels = "k1:t1,k2:t2,..." (overrides tile_hi_cap);
    # tile_hi_cap alone gives the two-level form with k_hi = max_per_tile.
    # 0/empty = single table; --max_per_tile 0 auto-sizes everything from
    # sample-view loads and RE-TUNES during training (PCP_RETUNE cadence).
    tile_k_lo: int = 0
    tile_hi_cap: int = 0
    tile_levels: str = ""
    # static upper bound on LIVE Gaussians: binning class tables (incl. a
    # compacted class A) scale from it instead of the slot capacity —
    # roughly halves the expansion+sort length when alive << capacity.
    # Auto-managed (with densify headroom) by the --max_per_tile 0
    # re-tuner; drops are counted if the population outgrows it between
    # re-tunes. 0 = capacity-scaled (zero-risk default).
    active_cap: int = 0
    pairs_per_gaussian: int = 16
    # data-driven pair-expansion ladder "r1:c1,r2:c2,...": footprint band
    # (r_{i-1}, r_i] expands in a (c_i, r_i) compact table instead of the
    # static class geometry (binning.choose_pair_levels). Auto-managed by
    # the --max_per_tile 0 re-tuner from measured footprint histograms;
    # "" = legacy static classes.
    pair_levels: str = ""
    # view-class tile geometry: cluster training views into <= N classes
    # by measured per-tile load profile and compile ONE train step per
    # class (binning.cluster_views). One static table must cover the
    # per-tile max over every view it serves; on large blocks the
    # all-views union is several times any single view's profile (round-4
    # quality run: 9.6M slots vs 2.5M per-view pairs), so per-class
    # tables recover most of CUDA's per-view dynamic sizing at the cost
    # of N compiles per (re-)tune. Requires --max_per_tile 0 (auto).
    # 1 = single shared geometry (default).
    view_classes: int = 1
    min_opacity: float = 0.005


@dataclass
class PipelineConfig:
    """PipelineParams (arguments/__init__.py:81-86)."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False
    use_appearance: bool = True
    # Fleet-only: replicate ONE appearance net + embedding table across
    # all blocks with psum-reduced gradients (parallel/fleet.py
    # _shared_app_reduce). The reference's per-block independent nets
    # (auto_train.py:22-51, train.py:111-117) diverge in effective
    # exposure and leave merged block-boundary radiance seams — sharing
    # is impossible for its per-process design, natural on a mesh.
    # Default False = reference semantics.
    share_appearance: bool = False
    # Appearance-map output range: the map is app_map_scale * sigmoid(x)
    # (models/appearance.py). Captured from PCP_APP_MAP_SCALE at config
    # build so the value persists in cfg_args — a model trained with
    # scale 2 would silently render halved maps if later loaded without
    # the env set (ADVICE r4 #3); loaders warn on mismatch.
    app_map_scale: float = field(
        default_factory=lambda: float(
            os.environ.get("PCP_APP_MAP_SCALE", "1")))


@dataclass
class TrainRunConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    test_iterations: List[int] = field(default_factory=lambda: [7_000, 30_000])
    save_iterations: List[int] = field(default_factory=lambda: [7_000, 30_000])
    checkpoint_iterations: List[int] = field(default_factory=list)
    start_checkpoint: Optional[str] = None
    seed: int = 0


def parse_tile_levels(spec: str):
    """"k1:t1,k2:t2,..." -> ((k1, t1), (k2, t2), ...); "" -> ()."""
    if not spec:
        return ()
    out = []
    for part in spec.split(","):
        k, t = part.split(":")
        out.append((int(k), int(t)))
    return tuple(out)


def format_tile_levels(levels) -> str:
    return ",".join(f"{k}:{t}" for k, t in levels)


def save_cfg_args(model_path: str, cfg: TrainRunConfig) -> None:
    """Persist config like train.py:177-178 writes cfg_args (JSON, safe)."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_cfg_args(model_path: str) -> TrainRunConfig:
    with open(os.path.join(model_path, "cfg_args.json")) as f:
        d = json.load(f)
    saved_scale = d.get("pipeline", {}).get("app_map_scale")
    if saved_scale is not None:
        from pcp_tpu.models import appearance as _app

        if abs(saved_scale - _app.APP_MAP_SCALE) > 1e-9:
            import warnings

            warnings.warn(
                f"cfg_args records app_map_scale={saved_scale} but this "
                f"process runs with PCP_APP_MAP_SCALE="
                f"{_app.APP_MAP_SCALE} — appearance maps will render "
                f"wrong; set PCP_APP_MAP_SCALE={saved_scale}")
    return TrainRunConfig(
        model=ModelConfig(**d["model"]),
        optim=OptimConfig(**d["optim"]),
        pipeline=PipelineConfig(**d["pipeline"]),
        test_iterations=d.get("test_iterations", [7_000, 30_000]),
        save_iterations=d.get("save_iterations", [7_000, 30_000]),
        checkpoint_iterations=d.get("checkpoint_iterations", []),
        start_checkpoint=d.get("start_checkpoint"),
        seed=d.get("seed", 0),
    )
