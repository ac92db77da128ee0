"""Batched view rendering: many cameras per jit call.

The reference renders test views one CUDA launch at a time (render.py:27-38).
Here cameras stack into a leading axis and vmap renders them in one XLA
program — on TPU this keeps the chip busy across views and amortises
dispatch. All cameras in a batch share one image size (group by size)."""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pcp_tpu.ops.projection import CameraIntrin
from pcp_tpu.scene.cameras import Camera
from pcp_tpu.train.step import render_gaussians


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "sh_degree", "max_per_tile", "max_pairs",
                     "tile_k_lo", "tile_hi_cap", "tile_levels"),
)
def _render_batch(params, alive, background, viewmats, intrins, *, w, h,
                  sh_degree, max_per_tile, max_pairs, tile_k_lo=0,
                  tile_hi_cap=0, tile_levels=()):
    """Module-level jitted batch render: params/alive are ARGUMENTS, not
    closure constants, so repeated eval calls over a run reuse ONE compiled
    program per (image size, batch) instead of retracing each invocation
    (each retrace costs a ~30-60 s remote compile on the real chip)."""

    def one(viewmat, intrin):
        img, _ = render_gaussians(
            params, alive, viewmat, intrin, (w, h), background,
            sh_degree, max_per_tile=max_per_tile, max_pairs=max_pairs,
            tile_k_lo=tile_k_lo, tile_hi_cap=tile_hi_cap,
            tile_levels=tile_levels,
        )
        return jnp.clip(img, 0.0, 1.0)

    return jax.vmap(one)(viewmats, intrins)


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "sh_degree", "max_per_tile", "max_pairs",
                     "tile_k_lo", "tile_hi_cap", "tile_levels"),
)
def _render_metrics_batch(params, alive, background, viewmats, intrins, gts,
                          *, w, h, sh_degree, max_per_tile, max_pairs,
                          tile_k_lo=0, tile_hi_cap=0, tile_levels=()):
    """Batched render + on-device L1/PSNR reduction: only two scalars per
    view cross the device boundary (training_report, train.py:188-243,
    evaluates hundreds of test views — per-view host math does not scale)."""
    from pcp_tpu.utils.image import psnr

    imgs = _render_batch(params, alive, background, viewmats, intrins,
                         w=w, h=h, sh_degree=sh_degree,
                         max_per_tile=max_per_tile, max_pairs=max_pairs,
                         tile_k_lo=tile_k_lo, tile_hi_cap=tile_hi_cap,
                         tile_levels=tile_levels)
    l1 = jnp.mean(jnp.abs(imgs - gts), axis=(1, 2, 3))
    return l1, psnr(imgs, gts)


def render_views(
    params,
    alive,
    cams: Sequence[Camera],
    sh_degree: int,
    background,
    *,
    max_per_tile: int = 1024,
    pairs_per_gaussian: int = 16,
    tile_k_lo: int = 0,
    tile_hi_cap: int = 0,
    tile_levels=(),
    batch: int = 8,
) -> List[np.ndarray]:
    """Render all cameras (one image size); returns a list of (H, W, 3)."""
    if not cams:
        return []
    sizes = {(c.width, c.height) for c in cams}
    assert len(sizes) == 1, f"one size per call, got {sizes}"
    w, h = next(iter(sizes))
    n = params["xyz"].shape[0]
    render_batch = functools.partial(
        _render_batch, params, alive, background, w=w, h=h,
        sh_degree=sh_degree, max_per_tile=max_per_tile,
        max_pairs=pairs_per_gaussian * n,
        tile_k_lo=tile_k_lo, tile_hi_cap=tile_hi_cap,
        tile_levels=tuple(tile_levels),
    )

    out: List[np.ndarray] = []
    for s in range(0, len(cams), batch):
        group = list(cams[s:s + batch])
        pad = batch - len(group)
        group_p = group + [group[-1]] * pad
        viewmats, intrins = _group_arrays(group_p)
        imgs = np.asarray(render_batch(viewmats, intrins))
        out.extend(imgs[: len(group)])
    return out


def _group_arrays(group_p):
    viewmats = jnp.asarray(np.stack([c.viewmat for c in group_p]))
    intrins = CameraIntrin(
        fx=jnp.asarray([c.fx for c in group_p], jnp.float32),
        fy=jnp.asarray([c.fy for c in group_p], jnp.float32),
        cx=jnp.asarray([c.width / 2.0 for c in group_p], jnp.float32),
        cy=jnp.asarray([c.height / 2.0 for c in group_p], jnp.float32),
    )
    return viewmats, intrins


def eval_views(
    params,
    alive,
    cams: Sequence[Camera],
    sh_degree: int,
    background,
    *,
    max_per_tile: int = 1024,
    pairs_per_gaussian: int = 16,
    tile_k_lo: int = 0,
    tile_hi_cap: int = 0,
    tile_levels=(),
    batch: int = 8,
):
    """Batched L1/PSNR over cameras of ONE image size; metrics reduce on
    device (two scalars per view come back, not full frames)."""
    if not cams:
        return [], []
    sizes = {(c.width, c.height) for c in cams}
    assert len(sizes) == 1, f"one size per call, got {sizes}"
    w, h = next(iter(sizes))
    n = params["xyz"].shape[0]
    l1s: List[float] = []
    psnrs: List[float] = []
    for s in range(0, len(cams), batch):
        group = list(cams[s:s + batch])
        pad = batch - len(group)
        group_p = group + [group[-1]] * pad
        viewmats, intrins = _group_arrays(group_p)
        gts = jnp.asarray(np.stack([np.asarray(c.gt_image) for c in group_p]))
        l1, ps = _render_metrics_batch(
            params, alive, background, viewmats, intrins, gts,
            w=w, h=h, sh_degree=sh_degree, max_per_tile=max_per_tile,
            max_pairs=pairs_per_gaussian * n,
            tile_k_lo=tile_k_lo, tile_hi_cap=tile_hi_cap,
            tile_levels=tuple(tile_levels),
        )
        l1s.extend(np.asarray(l1)[: len(group)].tolist())
        psnrs.extend(np.asarray(ps)[: len(group)].tolist())
    return l1s, psnrs
