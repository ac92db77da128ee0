"""Fused Pallas TPU kernel for tile compositing (forward + backward).

The jnp composite (ops/rasterize.py) expresses the per-tile front-to-back
blend as a lax.scan whose intermediates round-trip HBM every chunk step.
This kernel keeps the whole blend state (color accumulator, transmittance,
done mask) in VMEM scratch across the chunk axis, fusing all pointwise work
— the renderCUDA analog (forward.cu:261-374), on VPU lanes instead of CUDA
threads.

Layout: pixels of a 16x16 tile are flattened to 256 = 2x128 lanes; a block
covers TB tiles x CH Gaussians x 256 pixels. Grid = (tile_blocks, chunks)
with the chunk axis sequential ("arbitrary") so scratch carries across it.

Inputs are pre-gathered per-tile attribute tensors (XLA gather, cheap):
  mean  (nt, K, 2), conic (nt, K, 3), rgb (nt, K, 3), opac (nt, K),
  valid (nt, K) — from TileBins.tile_gauss.

The backward kernel re-traverses front-to-back (not CUDA's back-to-front:
we re-derive each step's incoming transmittance T_k from the carried
product, which is numerically stable because alpha <= 0.99 bounds each
factor away from 0) and accumulates dL/d{mean2d, conic, rgb, opacity} per
(tile, slot); the caller segment-sums slots back to Gaussians — the
deterministic replacement for backward.cu's atomicAdd.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcp_tpu.ops.projection import TILE

P = TILE * TILE            # 256 pixels per tile
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1.0e-4


def _alpha_and_state(mean, conic, opac, valid, pix, trans_in, done_in):
    """Shared forward math for one (TB, CH, P) block.

    Returns (alpha, t_excl, log1ma, trans_out, done_out):
      alpha  (TB, CH, P) after skip rules + sticky early stop
      t_excl (TB, CH, P) transmittance *before* each contribution
      trans_out (TB, P), done_out (TB, P)
    """
    dx = pix[:, None, :, 0] - mean[:, :, None, 0]          # (TB, CH, P)
    dy = pix[:, None, :, 1] - mean[:, :, None, 1]
    a = conic[:, :, None, 0]
    b = conic[:, :, None, 1]
    c = conic[:, :, None, 2]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opac[:, :, None] * jnp.exp(power))
    alpha = jnp.where(
        (power > 0.0) | (alpha < ALPHA_MIN) | ~valid[:, :, None], 0.0, alpha
    )
    log1ma = jnp.log1p(-alpha)
    t_after_raw = trans_in[:, None, :] * jnp.exp(jnp.cumsum(log1ma, axis=1))
    done_k = done_in[:, None, :] | (
        jnp.cumsum(t_after_raw < T_EPS, axis=1) > 0
    )
    alpha = jnp.where(done_k, 0.0, alpha)
    log1ma = jnp.log1p(-alpha)
    cum = jnp.cumsum(log1ma, axis=1)
    t_excl = trans_in[:, None, :] * jnp.exp(cum - log1ma)
    trans_out = trans_in * jnp.exp(cum[:, -1, :])
    done_out = done_k[:, -1, :]
    return alpha, t_excl, trans_out, done_out


def _fwd_kernel(mean_ref, conic_ref, rgb_ref, opac_ref, valid_ref, pix_ref,
                color_ref, trans_ref, t_scr, d_scr):
    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        t_scr[:] = jnp.ones_like(t_scr)
        d_scr[:] = jnp.zeros_like(d_scr)
        color_ref[:] = jnp.zeros_like(color_ref)

    trans_in = t_scr[:]
    done_in = d_scr[:] > 0.5
    alpha, t_excl, trans_out, done_out = _alpha_and_state(
        mean_ref[:], conic_ref[:], opac_ref[:], valid_ref[:] > 0,
        pix_ref[:], trans_in, done_in,
    )
    w = alpha * t_excl                                      # (TB, CH, P)
    color_ref[:] += jnp.einsum(
        "bkp,bkc->bpc", w, rgb_ref[:], preferred_element_type=jnp.float32
    )
    t_scr[:] = trans_out
    d_scr[:] = done_out.astype(jnp.float32)

    @pl.when(c_idx == pl.num_programs(1) - 1)
    def _():
        trans_ref[:] = t_scr[:]


@functools.partial(jax.jit, static_argnames=("tb", "ch"))
def _composite_fwd_pallas(mean, conic, rgb, opac, valid, pix, tb, ch):
    nt, k = opac.shape
    n_chunks = k // ch
    grid = (nt // tb, n_chunks)

    def tile_map(i, c):
        return (i * tb, c * ch, 0)

    def tile_map2(i, c):
        return (i * tb, c * ch)

    out_shape = (
        jax.ShapeDtypeStruct((nt, P, 3), jnp.float32),
        jax.ShapeDtypeStruct((nt, P), jnp.float32),
    )
    color, trans = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, ch, 2), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, ch, 3), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, ch, 3), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, ch), tile_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, ch), tile_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, P, 2), lambda i, c: (i * tb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, P, 3), lambda i, c: (i * tb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, P), lambda i, c: (i * tb, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tb, P), jnp.float32),
            pltpu.VMEM((tb, P), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(mean, conic, rgb, opac, valid, pix)
    return color, trans


def _bwd_kernel(mean_ref, conic_ref, rgb_ref, opac_ref, valid_ref, pix_ref,
                gcolor_ref, gtransfin_ref, transfin_ref,
                dmean_ref, dconic_ref, drgb_ref, dopac_ref,
                t_scr, d_scr):
    """Front-to-back re-traversal backward.

    For contribution k with weight w_k = alpha_k * T_k (T_k = transmittance
    before k) and final color C = sum w_k rgb_k + T_fin * bg:
      dL/drgb_k   = w_k * gC
      dL/dalpha_k = T_k * (rgb_k . gC) - S_k / (1 - alpha_k)
    where S_k = sum_{j>k} w_j (rgb_j . gC) + T_fin * gT_eff accounts for the
    attenuation of everything behind k (gT_eff folds the background/final-T
    cotangent). S_k is computed as suffix = total_tail - prefix using the
    carried transmittance — the same recurrence backward.cu:475-553 builds
    back-to-front with accum_rec.
    """
    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        t_scr[:] = jnp.ones_like(t_scr)
        d_scr[:] = jnp.zeros_like(d_scr)

    trans_in = t_scr[:]
    done_in = d_scr[:] > 0.5
    mean = mean_ref[:]
    conic = conic_ref[:]
    opac = opac_ref[:]
    valid = valid_ref[:] > 0
    pix = pix_ref[:]
    gC = gcolor_ref[:]                                       # (TB, P, 3)

    alpha, t_excl, trans_out, done_out = _alpha_and_state(
        mean, conic, opac, valid, pix, trans_in, done_in
    )

    rgb_dot_g = jnp.einsum(
        "bkc,bpc->bkp", rgb_ref[:], gC, preferred_element_type=jnp.float32
    )                                                        # (TB, CH, P)
    w = alpha * t_excl
    contrib = w * rgb_dot_g

    # Suffix sum over ALL remaining contributions (this chunk's tail + later
    # chunks). Total tail from here = C_rest = (color still to be added from
    # t_excl onward). We can get it from the invariant: the total remaining
    # weighted color after position k equals
    #   R_k = sum_{j>k, this chunk} contrib_j + R_chunk_end
    # and R_chunk_end is carried implicitly: at the end of the LAST chunk,
    # R = T_fin * gT_eff where gT_eff = (bg . gC) + gT_fin. We cannot carry
    # future information forward, so instead we use the algebraic identity
    #   S_k = (T_k' (C_tail)) — materialised by a SECOND pass: this kernel
    # is invoked twice by the host wrapper; pass 1 computes per-chunk total
    # contribution sums, the host suffix-sums them, pass 2 (this one) reads
    # the per-chunk suffix R via gtransfin_ref slot. To keep one kernel, we
    # exploit that suffix-within-chunk + carried chunk suffix is enough:
    # gtransfin_ref here is (TB, n_chunks_pad=P?) — see wrapper.
    chunk_suffix = gtransfin_ref[:]                          # (TB, P): R after this chunk
    within_suffix = (
        jnp.cumsum(contrib[:, ::-1, :], axis=1)[:, ::-1, :] - contrib
    )
    s_k = within_suffix + chunk_suffix[:, None, :]

    denom = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
    dalpha = t_excl * rgb_dot_g - s_k / denom
    dalpha = jnp.where(alpha > 0.0, dalpha, 0.0)

    # alpha = min(0.99, opac * G); grads masked where clamped
    g_val = jnp.where(opac[:, :, None] > 0, alpha / jnp.maximum(opac[:, :, None], 1e-12), 0.0)
    unclamped = alpha < ALPHA_MAX
    dopac_pix = jnp.where(unclamped, dalpha * g_val, 0.0)
    dG = jnp.where(unclamped, dalpha * opac[:, :, None], 0.0)
    # G = exp(power); dpower = dG * G = dalpha * alpha (unclamped)
    dpower = dG * g_val * opac[:, :, None]

    dx = pix[:, None, :, 0] - mean[:, :, None, 0]
    dy = pix[:, None, :, 1] - mean[:, :, None, 1]
    # power = -0.5 (a dx^2 + c dy^2) - b dx dy
    da = jnp.sum(dpower * (-0.5 * dx * dx), axis=2)
    db = jnp.sum(dpower * (-dx * dy), axis=2)
    dc = jnp.sum(dpower * (-0.5 * dy * dy), axis=2)
    a = conic[:, :, None, 0]
    b = conic[:, :, None, 1]
    c = conic[:, :, None, 2]
    dmx = jnp.sum(dpower * (a * dx + b * dy), axis=2)
    dmy = jnp.sum(dpower * (c * dy + b * dx), axis=2)

    dmean_ref[:] = jnp.stack([dmx, dmy], axis=-1)
    dconic_ref[:] = jnp.stack([da, db, dc], axis=-1)
    drgb_ref[:] = jnp.einsum(
        "bkp,bpc->bkc", w, gC, preferred_element_type=jnp.float32
    )
    dopac_ref[:] = jnp.sum(dopac_pix, axis=2)

    t_scr[:] = trans_out
    d_scr[:] = done_out.astype(jnp.float32)
    transfin_ref[:] = trans_out


def composite_pallas(
    tile_gauss: jnp.ndarray,     # (nt, K) int32, -1 pad
    means2d, conics, rgb, opac,  # per-Gaussian (N, ...) arrays
    *,
    tb: int = 8,
    ch: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable fused composite over pre-binned tiles.

    Returns (color (nt, 256, 3), final_T (nt, 256)). Gradients flow to
    means2d/conics/rgb/opac via a custom VJP whose backward is also Pallas.
    ``pix`` coordinates are derived by the caller-side wrapper in
    rasterize.py; here tiles are abstract rows.
    """
    raise NotImplementedError("wired via rasterize.py in a later milestone")
