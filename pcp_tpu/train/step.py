"""The training step: render -> appearance decouple -> loss -> Adam.

Redesign of the reference's per-iteration body (train.py:94-157) as one pure
function compiled once per (image size, SH degree). Differences from the
CUDA/torch original, by TPU design:

- gradients come from JAX autodiff through the chunked-scan rasterizer
  (deterministic; replaces backward.cu atomicAdd);
- the densification signal (per-Gaussian screen-space position gradient,
  train.py:140-147) is harvested by differentiating w.r.t. a zero
  ``means2d_offset`` probe instead of retain_grad on a dummy tensor
  (gaussian_renderer/__init__.py:23-31);
- densify/prune/opacity-reset are *separate* jitted transforms on the same
  fixed-capacity pytree (models/gaussians.py), invoked by the host loop on
  the reference cadence;
- the scene extent (spatial_lr_scale / densify size thresholds) is a traced
  scalar, so the block-parallel fleet (pcp_tpu.parallel) can vmap one
  compiled step over blocks with different extents.

``train_step_impl`` / ``densify_impl`` are the pure unjitted bodies;
``make_train_step`` / ``make_densify_step`` wrap them for single-block use.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pcp_tpu.models import gaussians as G
from pcp_tpu.models.appearance import decouple_appearance
from pcp_tpu.ops.projection import CameraIntrin
from pcp_tpu.ops.rasterize import rasterize
from pcp_tpu.train import optim
from pcp_tpu.train.config import parse_tile_levels
from pcp_tpu.train.config import OptimConfig
from pcp_tpu.utils.general import expon_lr
from pcp_tpu.utils.loss import l1_loss, ssim


class TrainState(NamedTuple):
    """Everything that evolves during training (a single pytree)."""

    params: Dict[str, jnp.ndarray]       # Gaussian params (capacity-padded)
    app: Any                             # appearance {embeddings, net} or None
    opt_g: Dict[str, Any]                # Adam state for Gaussians
    opt_a: Any                           # Adam state for appearance or None
    alive: jnp.ndarray                   # (C,) bool
    stats: Dict[str, jnp.ndarray]        # densify accumulators


def gaussian_lrs(ocfg: OptimConfig, spatial_lr_scale):
    """Per-group LRs (training_setup, gaussian_model.py:159-179): xyz gets
    the Plenoxels exponential schedule scaled by the scene extent
    (``spatial_lr_scale`` may be a traced scalar)."""
    xyz_sched = functools.partial(
        expon_lr,
        lr_init=ocfg.position_lr_init * spatial_lr_scale,
        lr_final=ocfg.position_lr_final * spatial_lr_scale,
        lr_delay_steps=0,
        lr_delay_mult=ocfg.position_lr_delay_mult,
        max_steps=ocfg.position_lr_max_steps,
    )
    return {
        "xyz": xyz_sched,
        "f_dc": ocfg.feature_lr,
        "f_rest": ocfg.feature_lr / 20.0,
        "scaling": ocfg.scaling_lr,
        "rotation": ocfg.rotation_lr,
        "opacity": ocfg.opacity_lr,
    }


def appearance_lrs(ocfg: OptimConfig):
    return {
        "embeddings": ocfg.appearance_embeddings_lr,
        "net": ocfg.appearance_network_lr,
    }


def render_gaussians(
    params,
    alive,
    viewmat,
    intrin: CameraIntrin,
    image_size,
    background,
    sh_degree: int,
    *,
    max_per_tile: int = 1024,
    max_pairs: int = None,
    tile_k_lo: int = 0,
    tile_hi_cap: int = 0,
    tile_levels=(),
    active_cap: int = 0,
    pair_levels=(),
    means2d_offset=None,
    tan_fov=None,
    scaling_modifier: float = 1.0,
):
    """Activate params and rasterize — the render() front-end
    (gaussian_renderer/__init__.py:18-100). ``scaling_modifier`` scales the
    activated extents like GaussianRasterizationSettings.scale_modifier."""
    opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
    return rasterize(
        params["xyz"],
        G.scaling_act(params["scaling"]) * scaling_modifier,
        params["rotation"],
        opac,
        G.sh_coeffs(params),
        viewmat,
        intrin,
        image_size,
        background,
        sh_degree,
        max_per_tile=max_per_tile,
        max_pairs=max_pairs,
        tile_k_lo=tile_k_lo,
        tile_hi_cap=tile_hi_cap,
        tile_levels=tile_levels,
        active_cap=active_cap,
        pair_levels=pair_levels,
        means2d_offset=means2d_offset,
        tan_fov=tan_fov,
    )


def train_step_impl(
    state: TrainState,
    viewmat,
    intrin: CameraIntrin,
    gt,                      # (H, W, 3)
    view_idx,                # () int32 appearance embedding id
    background,              # (3,)
    extent,                  # () spatial_lr_scale (traced)
    *,
    ocfg: OptimConfig,
    image_size,
    sh_degree: int,
    use_appearance: bool,
    valid_wh=None,
    app_grad_reduce=None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Pure step body (train.py:94-157). See module docstring.

    ``valid_wh`` ((2,) int32, traced) enables pad-and-mask mixed-resolution
    training: the camera's true (w, h) inside a padded (image_size) frame.
    L1/SSIM are exact w.r.t. the native resolution (zero-padded convs);
    appearance decoupling sees the zero-padded frame (exact when unmasked).

    ``app_grad_reduce`` (optional fn g_app -> g_app): cross-block
    reduction hook for the appearance gradients — the fleet's
    shared-appearance mode psums/pmeans them over the block axes BEFORE
    the Adam update, so replicated appearance state stays in lockstep
    (parallel/fleet.py make_fleet_step(share_appearance=True)).
    """
    w, h = int(image_size[0]), int(image_size[1])
    if gt.dtype == jnp.uint8:
        # device-resident GT banks store u8 (loop.gt_of); the sources are
        # 8-bit images, so u8 -> f32/255 reproduces them exactly
        gt = gt.astype(jnp.float32) / 255.0
    lrs_g = gaussian_lrs(ocfg, extent)
    lrs_a = appearance_lrs(ocfg)
    probe0 = jnp.zeros_like(state.params["xyz"][:, :2])
    mask = None
    if valid_wh is not None:
        mask = (jnp.arange(w)[None, :] < valid_wh[0]) & (
            jnp.arange(h)[:, None] < valid_wh[1]
        )

    def loss_fn(params, app, probe):
        image, aux = render_gaussians(
            params,
            state.alive,
            viewmat,
            intrin,
            (w, h),
            background,
            sh_degree,
            max_per_tile=ocfg.max_per_tile,
            max_pairs=ocfg.pairs_per_gaussian * params["xyz"].shape[0],
            tile_k_lo=ocfg.tile_k_lo,
            tile_hi_cap=ocfg.tile_hi_cap,
            tile_levels=parse_tile_levels(ocfg.tile_levels),
            active_cap=ocfg.active_cap,
            pair_levels=parse_tile_levels(ocfg.pair_levels),
            means2d_offset=probe,
        )
        if use_appearance and app is not None:
            decoupled, _ = decouple_appearance(image, app, view_idx)
        else:
            decoupled = image
        chw = lambda x: jnp.transpose(x, (2, 0, 1))
        loss = (1.0 - ocfg.lambda_dssim) * l1_loss(decoupled, gt, mask) + (
            ocfg.lambda_dssim
        ) * (1.0 - ssim(chw(image), chw(gt), valid_mask=mask))
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True
    )(state.params, state.app, probe0)
    g_gauss, g_app, g_probe = grads

    # --- densify bookkeeping (add_densification_stats,
    # gaussian_model.py:431-435; train.py:140-147) ---
    # CUDA accumulates NDC-frame gradients: pixel grad * (0.5 W, 0.5 H)
    # (backward.cu ddelx_dx). Match that so densify_grad_threshold=0.0002
    # keeps its reference meaning.
    gnorm = jnp.linalg.norm(g_probe * jnp.asarray([0.5 * w, 0.5 * h]), axis=-1)
    visible = aux["visible"] & state.alive
    stats = {
        "grad_accum": state.stats["grad_accum"] + jnp.where(visible, gnorm, 0.0),
        "denom": state.stats["denom"] + visible.astype(jnp.float32),
        "max_radii2d": jnp.maximum(
            state.stats["max_radii2d"], jnp.where(visible, aux["radii"], 0.0)
        ),
    }

    # Dead slots: make sure no gradient leaks into them.
    dead = ~state.alive
    g_gauss = jax.tree_util.tree_map(
        lambda g: jnp.where(dead.reshape((-1,) + (1,) * (g.ndim - 1)), 0.0, g),
        g_gauss,
    )

    params, opt_g = optim.adam_step(state.params, g_gauss, state.opt_g, lrs_g)
    if use_appearance and state.app is not None:
        if app_grad_reduce is not None:
            g_app = app_grad_reduce(g_app)
        app, opt_a = optim.adam_step_grouped(state.app, g_app, state.opt_a,
                                             lrs_a)
    else:
        app, opt_a = state.app, state.opt_a

    new_state = TrainState(params, app, opt_g, opt_a, state.alive, stats)
    metrics = {
        "loss": loss,
        "n_pairs": aux["n_pairs"],
        "n_visible": jnp.sum(visible),
        # pairs lost to static capacities (v1: global max_pairs; v2: class
        # tables / footprint truncation) — 0 on an honestly-sized workload
        "overflow": aux["n_dropped"] > 0,
        "n_dropped": aux["n_dropped"],
        "max_tile_load": aux["max_tile_load"],
        "tile_saturated": aux["max_tile_load"] > ocfg.max_per_tile,
    }
    return new_state, metrics


@functools.lru_cache(maxsize=16)
def _cached_train_step(ocfg_key, image_size, use_appearance):
    """One compiled step per (optim config, image size, appearance flag);
    extent is a traced input, so training many blocks of differing extents
    (sequential auto_train) reuses a single XLA program."""
    ocfg = OptimConfig(**dict(ocfg_key))

    @functools.partial(jax.jit, static_argnames=("sh_degree",), donate_argnums=(0,))
    def train_step(state, viewmat, intrin, gt, view_idx, background, extent,
                   sh_degree):
        return train_step_impl(
            state, viewmat, intrin, gt, view_idx, background, extent,
            ocfg=ocfg, image_size=image_size, sh_degree=sh_degree,
            use_appearance=use_appearance,
        )

    return train_step


def _ocfg_key(ocfg: OptimConfig):
    import dataclasses

    return tuple(sorted(dataclasses.asdict(ocfg).items()))


def make_train_step(
    ocfg: OptimConfig,
    image_size,
    spatial_lr_scale: float,
    *,
    use_appearance: bool = True,
):
    """Jitted single-block step for one image size. ``sh_degree`` is a static
    argument (4 compile variants over a run, train.py:89-91)."""
    cached = _cached_train_step(
        _ocfg_key(ocfg), (int(image_size[0]), int(image_size[1])), use_appearance
    )
    extent = jnp.float32(spatial_lr_scale)

    def train_step(state, viewmat, intrin, gt, view_idx, background, sh_degree):
        return cached(state, viewmat, intrin, gt, view_idx, background,
                      extent, sh_degree)

    return train_step


def densify_impl(
    state: TrainState, key, extent, *, ocfg: OptimConfig, prune_big: bool
) -> TrainState:
    """Densify+prune incl. optimizer moment surgery (pure body)."""
    params, alive, written = G.densify_and_prune(
        state.params,
        state.alive,
        state.stats,
        key,
        grad_threshold=ocfg.densify_grad_threshold,
        min_opacity=ocfg.min_opacity,
        extent=extent,
        percent_dense=ocfg.percent_dense,
        prune_big_screen=prune_big,
    )
    opt_g = optim.zero_moments(state.opt_g, written)
    stats = G.init_densify_stats(alive.shape[0])
    return TrainState(params, state.app, opt_g, state.opt_a, alive, stats)


@functools.lru_cache(maxsize=16)
def _cached_densify_step(ocfg_key):
    ocfg = OptimConfig(**dict(ocfg_key))

    @functools.partial(jax.jit, static_argnames=("prune_big",), donate_argnums=(0,))
    def densify_step(state, key, extent, prune_big: bool):
        return densify_impl(state, key, extent, ocfg=ocfg, prune_big=prune_big)

    return densify_step


def make_densify_step(ocfg: OptimConfig, extent: float):
    cached = _cached_densify_step(_ocfg_key(ocfg))
    ext = jnp.float32(extent)

    def densify_step(state, key, prune_big: bool):
        return cached(state, key, ext, prune_big)

    return densify_step


def opacity_reset_impl(state: TrainState) -> TrainState:
    """reset_opacity + moment surgery on the opacity group
    (gaussian_model.py:231-234, train.py:150-152)."""
    params = G.reset_opacity(state.params, state.alive)
    c = state.alive.shape[0]
    opt_g = optim.zero_moments(
        state.opt_g, jnp.ones((c,), bool), keys=("opacity",)
    )
    return TrainState(
        params, state.app, opt_g, state.opt_a, state.alive, state.stats
    )


opacity_reset_step = jax.jit(opacity_reset_impl, donate_argnums=(0,))
