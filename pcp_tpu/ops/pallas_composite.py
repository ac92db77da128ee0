"""Fused Pallas TPU kernels for tile compositing (forward + custom VJP).

The XLA composite (ops/rasterize.py) expresses the per-tile front-to-back
blend as a lax.scan whose intermediates round-trip HBM every chunk step and
whose backward rematerialises through jax.checkpoint. These kernels keep the
blend state (transmittance, early-stop bookkeeping, color accumulator) in
VMEM scratch across the chunk grid axis — the renderCUDA analog
(forward.cu:261-374) on VPU lanes.

Semantics preserved exactly (vs the jnp path and the CUDA original):
  alpha = min(0.99, opacity * exp(power)), skipped if power > 0 or
  alpha < 1/255; a pixel stops before the contribution that would push its
  transmittance below 1e-4, stickily.

Backward strategy (backward.cu:400-656 analog, deterministic):
  forward also records per-pixel ``n_contrib`` (1 + index of the last
  applied contribution, CUDA's last_contributor). The backward kernel walks
  chunks in REVERSE grid order carrying (T_after_chunk, suffix S); within a
  chunk it recomputes alphas from the same local rules masked by
  slot < n_contrib — exact, because the sticky stop means every applied slot
  precedes n_contrib — reconstructs each slot's incoming transmittance from
  the carried product, and emits per-(tile, slot) gradients. Per-Gaussian
  accumulation happens outside via JAX's scatter-add of the gather (no
  atomics, reproducible).

TPU mapping notes:
- work tensors are (TB tiles, P=256 pixels, CH=128 slots): slots on the
  128-wide lane axis, pixels on sublanes;
- front-to-back cumulative products/sums along the slot axis are
  Hillis-Steele masked-roll scans (7 steps; Mosaic has no cumsum), and
  transmittances are computed as direct products — no log/exp round-trips,
  since transcendental throughput bounds this kernel;
- grid = (tile blocks, chunks) with the chunk axis sequential so VMEM
  scratch carries across it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcp_tpu.ops.projection import TILE

P = TILE * TILE
INTERPRET = False  # tests set True to run the kernels on CPU
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1.0e-4

TB = int(__import__("os").environ.get("PCP_TB", "8"))
           # tiles per block (sublane-divisible)
import os as _os

CH = int(_os.environ.get("PCP_CH", "128"))
           # Gaussian slots per chunk; the MXU triangular-matmul scans cost
           # O(CH) per slot, so smaller CH = fewer scan FLOPs but more grid
           # steps (and <128 underfills the lane dim)

PP = int(_os.environ.get("PCP_PP", "256"))
           # pixel slice per backward grid step: = P (no slicing), so each
           # att block is DMA'd ONCE per chunk — PP=128 re-read every block
           # and measured 2.2x slower (90 ms vs 41 ms fwd+bwd at 2M pairs).

# Slot-axis scans as triangular matmuls on the MXU (bf16x3-compensated,
# see _mxu_cumsum) instead of log2(CH)=7 masked-roll VPU passes: ~+1
# iters/s end to end. PCP_MXU_SCANS=0 falls back to exact f32 roll scans.
USE_MXU_SCANS = _os.environ.get("PCP_MXU_SCANS", "1") == "1"

# Split knob: with MXU scans on, route only the CUMPRODs (which pay a
# log+exp transcendental round-trip to ride the matmul) back to the VPU
# roll scan, keeping the additive scans on the MXU. A/B-only.
USE_MXU_CUMPROD = _os.environ.get("PCP_MXU_CUMPROD", "1") == "1"

# Backward mean/conic planes as pixel-moment matmuls (see _bwd_chunk_body):
# the 5 (TB, PP, CH)->(TB, CH) masked reduces + their dx/dy polynomial
# products collapse into 3 bf16x3 matmuls against an EXACT bf16 basis
# (local pixel coords < 16, so every basis integer <= 225) + per-slot math.
USE_BWD_MOMENTS = _os.environ.get("PCP_BWD_MOMENTS", "1") == "1"


def _tri(inclusive: bool, reverse: bool):
    """(CH, CH) 0/1 matrix T with (x @ T)[k] = sum over the prefix
    (suffix when ``reverse``) of x. Built from iota inside the kernel —
    Pallas kernels may not capture constant arrays."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 1)
    if reverse:
        m = (r >= c) if inclusive else (r > c)
    else:
        m = (r <= c) if inclusive else (r < c)
    return m.astype(jnp.float32)


def _trunc_bf16(x):
    """Truncate an f32 to its nearest-below bf16-representable value."""
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )


def _mxu_cumsum(x, reverse=False):
    """Inclusive cumsum along the last axis of (TB, P, CH) via the MXU.

    Mosaic truncates MXU inputs to bf16 regardless of Precision flags
    (measured: 3e-3 image error on real-chip parity), so the input splits
    into THREE bf16-exact components (hi + mid + lo = x to ~2^-24
    relative); each multiplies the 0/1 triangular matrix losslessly and
    the f32 accumulator adds them back — bf16x3 emulated f32, ~5e-7 end
    error on the summed logs, at 3 trivially-small matmuls.
    """
    t = _tri(True, reverse)
    shp = x.shape
    x2 = x.reshape(-1, CH)
    hi = _trunc_bf16(x2)
    rem = x2 - hi
    mid = _trunc_bf16(rem)
    lo = rem - mid
    y = (
        jnp.dot(hi, t, preferred_element_type=jnp.float32)
        + jnp.dot(mid, t, preferred_element_type=jnp.float32)
        + jnp.dot(lo, t, preferred_element_type=jnp.float32)
    )
    return y.reshape(shp)


def _mxu_cumprod(x, reverse=False):
    """Inclusive cumprod of strictly-positive x along the slot axis:
    exp(cumsum(log x)) with the cumsum on the MXU."""
    return jnp.exp(_mxu_cumsum(jnp.log(x), reverse=reverse))


def _last_slot(x):
    """x[:, :, CH-1] via a static slice (negative/int indexing lowers to
    dynamic_slice, which Mosaic does not implement)."""
    return jax.lax.slice_in_dim(x, CH - 1, CH, axis=2)[:, :, 0]


def _cumsum_slots(x):
    """Inclusive cumsum along the last (slot/lane) axis of (TB, P, CH).

    Hillis-Steele shift-add scan: log2(CH)=7 masked-roll+add steps on the
    VPU (Mosaic has no cumsum primitive)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    d = 1
    while d < CH:
        shifted = pltpu.roll(x, d, axis=2)
        x = x + jnp.where(lane >= d, shifted, 0.0)
        d *= 2
    return x


def _cumprod_slots(x, scr=None):
    """Inclusive cumprod along the slot axis (same scan, multiplicative).
    Direct products replace the log1p/exp round-trips — transcendental
    throughput, not FLOPs, bounds this kernel. When ``scr`` (a VMEM ref of
    x's shape) is given, every scan step rewrites it in place: without it,
    Mosaic's stack allocator keeps all log2(CH) intermediate buffers live
    (~7 MB each scan) and the kernel blows the 16 MB VMEM budget."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    if scr is None:
        d = 1
        while d < CH:
            x = x * jnp.where(lane >= d, pltpu.roll(x, d, axis=2), 1.0)
            d *= 2
        return x
    scr[:] = x
    d = 1
    while d < CH:
        scr[:] = scr[:] * jnp.where(lane >= d, pltpu.roll(scr[:], d, axis=2), 1.0)
        d *= 2
    return scr[:]


def _cumprod_slots_rev(x, scr=None):
    """Suffix (reverse-inclusive) cumprod along the slot axis (in-place in
    ``scr`` when given — see _cumprod_slots)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    if scr is None:
        d = 1
        while d < CH:
            x = x * jnp.where(lane < CH - d, pltpu.roll(x, CH - d, axis=2), 1.0)
            d *= 2
        return x
    scr[:] = x
    d = 1
    while d < CH:
        scr[:] = scr[:] * jnp.where(
            lane < CH - d, pltpu.roll(scr[:], CH - d, axis=2), 1.0
        )
        d *= 2
    return scr[:]


def _cumsum_slots_rev(x, scr=None):
    """Suffix (reverse-inclusive) cumsum along the slot axis (in-place in
    ``scr`` when given — see _cumprod_slots)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    if scr is None:
        d = 1
        while d < CH:
            x = x + jnp.where(lane < CH - d, pltpu.roll(x, CH - d, axis=2), 0.0)
            d *= 2
        return x
    scr[:] = x
    d = 1
    while d < CH:
        scr[:] = scr[:] + jnp.where(
            lane < CH - d, pltpu.roll(scr[:], CH - d, axis=2), 0.0
        )
        d *= 2
    return scr[:]


def _shift_right_one(x, fill):
    """x[k-1] with x[-1] := fill, along the slot axis."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    return jnp.where(lane >= 1, pltpu.roll(x, 1, axis=2), fill)


def _block_rows(i):
    """Default tile ids for block i: (TB, 1) int32 = i*TB + [0..TB)."""
    return i * TB + jax.lax.broadcasted_iota(jnp.int32, (TB, 1), 0)


def _pix_coords(rows01, tiles_x):
    """Pixel centers for the TB tiles with ids ``rows01`` (TB, 1): (TB, P)."""
    rows = jnp.broadcast_to(rows01, (TB, P))
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, P), 1)
    x0 = (rows % tiles_x) * TILE
    y0 = (rows // tiles_x) * TILE
    px = (x0 + lane % TILE).astype(jnp.float32)
    py = (y0 + lane // TILE).astype(jnp.float32)
    return px, py


def _pix_coords_slice(rows01, p_idx, tiles_x):
    """Pixel centers for tile ids ``rows01``, pixel slice p_idx: (TB, PP)."""
    rows = jnp.broadcast_to(rows01, (TB, PP))
    lane = p_idx * PP + jax.lax.broadcasted_iota(jnp.int32, (TB, PP), 1)
    x0 = (rows % tiles_x) * TILE
    y0 = (rows // tiles_x) * TILE
    px = (x0 + lane % TILE).astype(jnp.float32)
    py = (y0 + lane // TILE).astype(jnp.float32)
    return px, py


def _local_alpha(mx, my, ca, cb, cc, op, valid, px, py):
    """Per-slot alpha from the local skip rules only (no history).

    Attribute inputs (TB, CH), pixel coords (TB, P); returns
    (alpha (TB, P, CH), dx, dy)."""
    dx = px[:, :, None] - mx[:, None, :]
    dy = py[:, :, None] - my[:, None, :]
    a = ca[:, None, :]
    b = cb[:, None, :]
    c = cc[:, None, :]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op[:, None, :] * jnp.exp(power))
    alpha = jnp.where(
        (power > 0.0) | (alpha < ALPHA_MIN) | ~(valid[:, None, :] > 0),
        0.0, alpha,
    )
    return alpha, dx, dy


# Alpha evaluation on the MXU: power = -0.5*(a*dx^2 + c*dy^2) - b*dx*dy is,
# in LOCAL tile coordinates, a (P, 6) pixel basis [1, px, py, px^2, px*py,
# py^2] (integers <= 225 — exact bf16) times a per-slot (6, CH) coefficient
# matrix (bf16x3 split, like _mxu_cumsum). Moves ~10 of the ~30 VPU ops per
# slot-pixel onto the MXU. Error ~2^-24 * |coeff terms| (the terms are
# O(10) for any slot whose tile rect the splat actually touches), so the
# `power > 0` degenerate-conic skip gets a 1e-6 guard band.
USE_MXU_POWER = _os.environ.get("PCP_MXU_POWER", "1") == "1"


def _local_alpha_mxu(at, rows01, tiles_x, p0, np_):
    """Per-slot alpha via the MXU pixel-basis matmul (no dx/dy outputs).

    at (NA, TB, CH), rows01 (TB, 1) tile ids; returns alpha (TB, np_, CH)
    for the pixel slice [p0, p0+np_) of the block's tiles."""
    rows = jnp.broadcast_to(rows01, (TB, CH))
    tx0 = ((rows % tiles_x) * TILE).astype(jnp.float32)
    ty0 = ((rows // tiles_x) * TILE).astype(jnp.float32)
    mxl = _row(at, _I_MX) - tx0
    myl = _row(at, _I_MY) - ty0
    ca = _row(at, _I_CA)
    cb = _row(at, _I_CB)
    cc = _row(at, _I_CC)
    q = jnp.concatenate(
        [
            (-0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl)[None],
            (ca * mxl + cb * myl)[None],
            (cc * myl + cb * mxl)[None],
            (-0.5 * ca)[None],
            (-cb)[None],
            (-0.5 * cc)[None],
        ],
        axis=0,
    )                                                # (6, TB, CH)
    lane = p0 + jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)
    pxl = (lane % TILE).astype(jnp.float32)          # (np_, 1)
    pyl = (lane // TILE).astype(jnp.float32)
    basis = jnp.concatenate(
        [jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl],
        axis=1,
    )                                                # (np_, 6), exact bf16
    hi = _trunc_bf16(q)
    rem = q - hi
    mid = _trunc_bf16(rem)
    lo = rem - mid
    powers = []
    for t in range(TB):
        sl = lambda x: jax.lax.slice_in_dim(x, t, t + 1, axis=1)[:, 0, :]
        p_t = (
            jnp.dot(basis, sl(hi), preferred_element_type=jnp.float32)
            + jnp.dot(basis, sl(mid), preferred_element_type=jnp.float32)
            + jnp.dot(basis, sl(lo), preferred_element_type=jnp.float32)
        )
        powers.append(p_t[None])
    power = jnp.concatenate(powers, axis=0)          # (TB, np_, CH)
    op = _row(at, _I_OP)[:, None, :]
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    alpha = jnp.where(
        (power > 1.0e-6) | (alpha < ALPHA_MIN) | ~(op > 0), 0.0, alpha
    )
    return alpha


NA = 9  # packed attribute rows: mx my ca cb cc r g b op
# Slot validity is carried by opacity: rasterize zeroes every attribute of
# pad/dead slots (ids < 0), and op == 0 already composites to exactly
# nothing (alpha < 1/255 skip), so a separate valid plane would only pad
# the gather/scatter/DMA traffic that scales with every tile pair.
_I_MX, _I_MY, _I_CA, _I_CB, _I_CC, _I_R, _I_G, _I_B, _I_OP = range(9)
_I_VALID = _I_OP  # validity test is op > 0


def _row(att, j):
    """att (NA, TB, CH) -> attribute plane j as (TB, CH) (static slice).

    Plane-major layout: NA=9 on the OUTER axis keeps the tiled (TB/8, CH/
    128) dims full — a (.., NA, ..)-minor layout would lane- or sublane-pad
    9 -> 16/128 through every DMA and HBM materialization."""
    return jax.lax.slice_in_dim(att, j, j + 1, axis=0)[0]


def _gc_row(gc, j):
    """gcolor (TB, 3, P) -> channel j as (TB, P, 1)."""
    return jax.lax.slice_in_dim(gc, j, j + 1, axis=1)[:, 0, :][:, :, None]


def _fwd_kernel(att, color_ref, tfin_ref, ncontrib_ref,
                t_scr, d_scr, nc_scr, scan_scr, *, tiles_x):
    rows01 = _block_rows(pl.program_id(0))
    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        t_scr[:] = jnp.ones_like(t_scr)
        d_scr[:] = jnp.zeros_like(d_scr)
        nc_scr[:] = jnp.zeros_like(nc_scr)
        color_ref[:] = jnp.zeros_like(color_ref)

    # Early chunk exit (renderCUDA's per-warp termination analog,
    # forward.cu:298-301): once every pixel of the block is done, later
    # chunks contribute nothing — skip their compute entirely (the att DMA
    # already happened; the VPU/MXU work is what this saves). On saturated
    # scenes T collapses after ~1-2 chunks of 4.
    @pl.when(jnp.min(d_scr[:]) < 0.5)
    def _compute():
        a = att[:]
        # Load-bounded skip: chunks past every tile's live count carry only
        # zero-valid pad slots (binning writes -1 ids -> valid 0), so the
        # whole chunk is inert — one reduce on the already-DMA'd block
        # gates the VPU/MXU work. Makes a generous max_per_tile ~free in
        # compute (cost tracks the actual max tile load, not K).
        chunk_live = jnp.max(_row(a, _I_VALID)) > 0.0

        @pl.when(chunk_live)
        def _compute_live():
            _fwd_chunk_body(a, color_ref, t_scr, d_scr, nc_scr, scan_scr,
                            rows01, c_idx, tiles_x)

    @pl.when(c_idx == pl.num_programs(1) - 1)
    def _():
        tfin_ref[:] = t_scr[:]
        ncontrib_ref[:] = nc_scr[:]


def _fwd_chunk_body(a, color_ref, t_scr, d_scr, nc_scr, scan_scr, rows01,
                    c_idx, tiles_x):
    if True:  # body lifted verbatim out of _fwd_kernel's nested pl.when
        if USE_MXU_POWER:
            alpha = _local_alpha_mxu(a, rows01, tiles_x, 0, P)
        else:
            px, py = _pix_coords(rows01, tiles_x)
            alpha, _, _ = _local_alpha(
                _row(a, _I_MX), _row(a, _I_MY), _row(a, _I_CA),
                _row(a, _I_CB), _row(a, _I_CC), _row(a, _I_OP),
                _row(a, _I_VALID), px, py,
            )

        trans_in = t_scr[:]                               # (TB, P)
        if USE_MXU_SCANS and USE_MXU_CUMPROD:
            prod_raw = _mxu_cumprod(1.0 - alpha)          # (TB, P, CH)
        else:
            prod_raw = _cumprod_slots(1.0 - alpha, scan_scr)
        t_after_raw = trans_in[:, :, None] * prod_raw
        # prod_raw is monotonically non-increasing (factors <= 1), so the
        # sticky stop needs NO scan: done at slot k iff T after k would be
        # < eps. (i1 minor-dim broadcast unsupported: compare f32 in 3D.)
        done_k = (d_scr[:][:, :, None] > 0.5) | (t_after_raw < T_EPS)
        alpha = jnp.where(done_k, 0.0, alpha)
        # cumprod of the MASKED alphas == prod_raw frozen at its last valid
        # value (monotonic, masked factors are 1): a min-reduction, no scan.
        frozen = jnp.min(
            jnp.where(done_k, 1.0, prod_raw), axis=2, keepdims=True
        )
        prod_incl = jnp.where(done_k, frozen, prod_raw)
        t_excl = trans_in[:, :, None] * _shift_right_one(prod_incl, 1.0)
        w = alpha * t_excl                                # (TB, P, CH)

        color_ref[:] = color_ref[:] + jnp.stack(
            [
                jnp.sum(w * _row(a, _I_R)[:, None, :], axis=2),
                jnp.sum(w * _row(a, _I_G)[:, None, :], axis=2),
                jnp.sum(w * _row(a, _I_B)[:, None, :], axis=2),
            ],
            axis=1,
        )

        # last applied slot + 1, global over chunks (CUDA last_contributor)
        applied = alpha > 0.0
        slot1 = (
            c_idx * CH
            + jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 2)
            + 1
        ).astype(jnp.float32)
        nc_scr[:] = jnp.maximum(
            nc_scr[:], jnp.max(jnp.where(applied, slot1, 0.0), axis=2)
        )

        t_scr[:] = trans_in * _last_slot(prod_incl)
        d_scr[:] = _last_slot(done_k.astype(jnp.float32))


def _bwd_kernel(att, gcolor, gtfin, tfin, ncontrib,
                datt, t_scr, s_scr, scan1, scan2, *, tiles_x):
    """Grid (tile block, reversed chunk, pixel slice) — pixel slice is the
    innermost dim so the revisited datt accumulator block is written in
    consecutive steps; the (T, S) carries live in full-width scratch and are
    indexed per pixel slice."""
    rows01 = _block_rows(pl.program_id(0))
    c_rev = pl.program_id(1)
    p_idx = pl.program_id(2)
    n_chunks = pl.num_programs(1)
    c_idx = n_chunks - 1 - c_rev   # true chunk index (blocks mapped reversed)
    psl = pl.ds(p_idx * PP, PP)

    @pl.when(c_rev == 0)
    def _():
        t_scr[:, psl] = tfin[:]                  # T after the LAST chunk
        s_scr[:, psl] = tfin[:] * gtfin[:]       # suffix incl. final-T term

    @pl.when(p_idx == 0)
    def _():
        datt[:] = jnp.zeros_like(datt)

    # Early chunk exit: slots at or past every pixel's n_contrib received
    # no forward contribution, so their alphas mask to zero — the whole
    # chunk's gradient is zero and the (T, S) carries pass through
    # unchanged (suffix == 1, csuf == 0). Skip the compute.
    chunk_live = jnp.float32(c_idx * CH) < jnp.max(ncontrib[:])

    @pl.when(chunk_live)
    def _compute():
        _bwd_chunk_body(att, gcolor, gtfin, tfin, ncontrib, datt, t_scr,
                        s_scr, scan1, scan2, rows01, c_idx, p_idx, tiles_x)


def _bwd_chunk_body(att, gcolor, gtfin, tfin, ncontrib, datt, t_scr, s_scr,
                    scan1, scan2, rows01, c_idx, p_idx, tiles_x):
    psl = pl.ds(p_idx * PP, PP)
    at = att[:]
    if USE_MXU_POWER and USE_BWD_MOMENTS:
        alpha = _local_alpha_mxu(at, rows01, tiles_x, p_idx * PP, PP)
        dx = dy = None  # only the non-moments plane path needs them
    else:
        px, py = _pix_coords_slice(rows01, p_idx, tiles_x)
        alpha, dx, dy = _local_alpha(
            _row(at, _I_MX), _row(at, _I_MY), _row(at, _I_CA),
            _row(at, _I_CB), _row(at, _I_CC), _row(at, _I_OP),
            _row(at, _I_VALID), px, py,
        )
    slot = (
        c_idx * CH + jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 2)
    ).astype(jnp.float32)
    alpha = jnp.where(slot < ncontrib[:][:, :, None], alpha, 0.0)

    t_end = t_scr[:, psl]                         # (TB, PP): T after chunk
    # suffix product of (1 - alpha): T before slot k = t_end / suffix[k].
    # Bounded: the forward sticky stop keeps T >= ~1e-4 among applied
    # slots, so the divisor never underflows where the result matters.
    if USE_MXU_SCANS and USE_MXU_CUMPROD:
        suffix = _mxu_cumprod(1.0 - alpha, reverse=True)
    else:
        suffix = _cumprod_slots_rev(1.0 - alpha, scan1)
    t_excl = t_end[:, :, None] / suffix           # T before slot k
    w = alpha * t_excl

    gC = gcolor[:]                                # (TB, 3, PP)
    rgb_dot_g = (
        _row(at, _I_R)[:, None, :] * _gc_row(gC, 0)
        + _row(at, _I_G)[:, None, :] * _gc_row(gC, 1)
        + _row(at, _I_B)[:, None, :] * _gc_row(gC, 2)
    )                                             # (TB, PP, CH)
    contrib = w * rgb_dot_g
    if USE_MXU_SCANS:
        csuf = _mxu_cumsum(contrib, reverse=True)  # sum_{j>=k} contrib_j
    else:
        csuf = _cumsum_slots_rev(contrib, scan2)
    s_k = csuf - contrib + s_scr[:, psl][:, :, None]

    denom = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
    dalpha = t_excl * rgb_dot_g - s_k / denom
    dalpha = jnp.where(alpha > 0.0, dalpha, 0.0)

    opb = jnp.maximum(_row(at, _I_OP)[:, None, :], ALPHA_MIN)
    g_val = alpha / opb                           # exp(power) where applied
    unclamped = alpha < ALPHA_MAX
    dop_pix = jnp.where(unclamped, dalpha * g_val, 0.0)
    dpower = jnp.where(unclamped, dalpha * alpha, 0.0)

    ca2 = _row(at, _I_CA)
    cb2 = _row(at, _I_CB)
    cc2 = _row(at, _I_CC)
    zero = jnp.zeros((1, alpha.shape[0], alpha.shape[2]), jnp.float32)
    if USE_BWD_MOMENTS:
        # dx = pxl - mxl in LOCAL tile coordinates (pxl in [0, TILE)), so
        # the 5 mean/conic plane reductions are polynomial combinations of
        # six pixel moments of dpower: M_m[k] = sum_p dpower[p,k] B[p,m],
        # B = [1, pxl, pyl, pxl^2, pxl*pyl, pyl^2]. Every B entry is an
        # integer <= (TILE-1)^2 = 225 — EXACT under Mosaic's bf16 MXU
        # truncation — so only dpower needs the bf16x3 split. Replaces 5
        # (TB, PP, CH) masked reduces + ~10 polynomial products with
        # 3*TB tiny matmuls + per-slot (TB, CH) math.
        lane = p_idx * PP + jax.lax.broadcasted_iota(jnp.int32, (1, PP), 1)
        pxl = (lane % TILE).astype(jnp.float32)            # (1, PP)
        pyl = (lane // TILE).astype(jnp.float32)
        Bt = jnp.concatenate(
            [jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl],
            axis=0,
        )                                                  # (6, PP) exact
        hi = _trunc_bf16(dpower)
        rem = dpower - hi
        mid = _trunc_bf16(rem)
        lo = rem - mid
        moms = []
        for t in range(TB):
            m = (
                jnp.dot(Bt, hi[t], preferred_element_type=jnp.float32)
                + jnp.dot(Bt, mid[t], preferred_element_type=jnp.float32)
                + jnp.dot(Bt, lo[t], preferred_element_type=jnp.float32)
            )                                              # (6, CH)
            moms.append(m[:, None, :])                     # (6, 1, CH)
        M = jnp.concatenate(moms, axis=1)                  # (6, TB, CH)
        m0 = _row(M, 0)
        mx_m = _row(M, 1)
        my_m = _row(M, 2)
        mxx = _row(M, 3)
        mxy = _row(M, 4)
        myy = _row(M, 5)
        # Gaussian means in the same local frame: mxl = mx - tile_x0.
        rows = jnp.broadcast_to(rows01, (TB, CH))
        tx0 = ((rows % tiles_x) * TILE).astype(jnp.float32)
        ty0 = ((rows // tiles_x) * TILE).astype(jnp.float32)
        mxl = _row(at, _I_MX) - tx0
        myl = _row(at, _I_MY) - ty0
        sdx = mx_m - mxl * m0                              # sum dpower*dx
        sdy = my_m - myl * m0
        sdxx = mxx - 2.0 * mxl * mx_m + mxl * mxl * m0
        sdxy = mxy - mxl * my_m - myl * mx_m + mxl * myl * m0
        sdyy = myy - 2.0 * myl * my_m + myl * myl * m0
        planes = [
            (ca2 * sdx + cb2 * sdy)[None],                             # dmx
            (cc2 * sdy + cb2 * sdx)[None],                             # dmy
            (-0.5 * sdxx)[None],                                       # dca
            (-sdxy)[None],                                             # dcb
            (-0.5 * sdyy)[None],                                       # dcc
            jnp.sum(w * _gc_row(gC, 0), axis=1)[None],                 # dr
            jnp.sum(w * _gc_row(gC, 1), axis=1)[None],                 # dg
            jnp.sum(w * _gc_row(gC, 2), axis=1)[None],                 # db
            jnp.sum(dop_pix, axis=1)[None],                            # dop
        ] + [zero] * (NA - 9)
    else:
        ca3, cb3, cc3 = ca2[:, None, :], cb2[:, None, :], cc2[:, None, :]
        planes = [
            jnp.sum(dpower * (ca3 * dx + cb3 * dy), axis=1)[None],
            jnp.sum(dpower * (cc3 * dy + cb3 * dx), axis=1)[None],
            jnp.sum(dpower * (-0.5 * dx * dx), axis=1)[None],
            jnp.sum(dpower * (-dx * dy), axis=1)[None],
            jnp.sum(dpower * (-0.5 * dy * dy), axis=1)[None],
            jnp.sum(w * _gc_row(gC, 0), axis=1)[None],
            jnp.sum(w * _gc_row(gC, 1), axis=1)[None],
            jnp.sum(w * _gc_row(gC, 2), axis=1)[None],
            jnp.sum(dop_pix, axis=1)[None],
        ] + [zero] * (NA - 9)
    datt[:] = datt[:] + jnp.concatenate(planes, axis=0)

    # carries for the next (earlier) chunk
    first = lambda x: jax.lax.slice_in_dim(x, 0, 1, axis=2)[:, :, 0]
    t_scr[:, psl] = t_end / first(suffix)         # T before this chunk
    s_scr[:, psl] = s_scr[:, psl] + first(csuf)


def _fwd_kernel_tid(tids, att, color_ref, tfin_ref, ncontrib_ref,
                    t_scr, d_scr, nc_scr, scan_scr, *, tiles_x):
    """Forward kernel whose tile ids come from an input ref (TB, 1) instead
    of the grid index — the hi-class table of the two-level composite holds
    an arbitrary subset of tiles (see rasterize.composite_fused's split
    path). Pad rows carry all-zero attributes (op == 0), so whatever tile
    id they alias composites to exactly nothing."""
    rows01 = tids[:]
    c_idx = pl.program_id(1)

    @pl.when(c_idx == 0)
    def _():
        t_scr[:] = jnp.ones_like(t_scr)
        d_scr[:] = jnp.zeros_like(d_scr)
        nc_scr[:] = jnp.zeros_like(nc_scr)
        color_ref[:] = jnp.zeros_like(color_ref)

    @pl.when(jnp.min(d_scr[:]) < 0.5)
    def _compute():
        a = att[:]
        chunk_live = jnp.max(_row(a, _I_VALID)) > 0.0

        @pl.when(chunk_live)
        def _compute_live():
            _fwd_chunk_body(a, color_ref, t_scr, d_scr, nc_scr, scan_scr,
                            rows01, c_idx, tiles_x)

    @pl.when(c_idx == pl.num_programs(1) - 1)
    def _():
        tfin_ref[:] = t_scr[:]
        ncontrib_ref[:] = nc_scr[:]


def _bwd_kernel_tid(tids, att, gcolor, gtfin, tfin, ncontrib,
                    datt, t_scr, s_scr, scan1, scan2, *, tiles_x):
    """Backward kernel with input-ref tile ids (see _fwd_kernel_tid)."""
    rows01 = tids[:]
    c_rev = pl.program_id(1)
    p_idx = pl.program_id(2)
    n_chunks = pl.num_programs(1)
    c_idx = n_chunks - 1 - c_rev
    psl = pl.ds(p_idx * PP, PP)

    @pl.when(c_rev == 0)
    def _():
        t_scr[:, psl] = tfin[:]
        s_scr[:, psl] = tfin[:] * gtfin[:]

    @pl.when(p_idx == 0)
    def _():
        datt[:] = jnp.zeros_like(datt)

    chunk_live = jnp.float32(c_idx * CH) < jnp.max(ncontrib[:])

    @pl.when(chunk_live)
    def _compute():
        _bwd_chunk_body(att, gcolor, gtfin, tfin, ncontrib, datt, t_scr,
                        s_scr, scan1, scan2, rows01, c_idx, p_idx, tiles_x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def composite_tiles_tid(att, tids, tiles_x):
    """composite_tiles with EXPLICIT per-row tile ids (nt, 1) int32.

    Rows map to arbitrary tiles of the (tiles_x, ...) grid — the hi-class
    table of the two-level composite (rasterize.composite_fused). Pad rows
    (no tile) must carry zeroed attributes; their tile id only selects the
    pixel frame they inertly composite nothing into.
    """
    color, tfin, _ = _fwd_tid(att, tids, tiles_x)
    return color, tfin


def _fwd_tid(att, tids, tiles_x):
    na, nt, k = att.shape
    n_chunks = k // CH
    att_map, per_tile2, per_tile3 = _specs(n_chunks)
    v = pltpu.VMEM
    color, tfin, ncontrib = pl.pallas_call(
        functools.partial(_fwd_kernel_tid, tiles_x=tiles_x),
        grid=(nt // TB, n_chunks),
        in_specs=[
            pl.BlockSpec((TB, 1), lambda i, c: (i, 0), memory_space=v),
            pl.BlockSpec((NA, TB, CH), att_map, memory_space=v),
        ],
        out_specs=(
            pl.BlockSpec((TB, 3, P), per_tile3, memory_space=v),
            pl.BlockSpec((TB, P), per_tile2, memory_space=v),
            pl.BlockSpec((TB, P), per_tile2, memory_space=v),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((nt, P), jnp.float32),
            jax.ShapeDtypeStruct((nt, P), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, P), jnp.float32),
            pltpu.VMEM((TB, P), jnp.float32),
            pltpu.VMEM((TB, P), jnp.float32),
            pltpu.VMEM((TB, P, CH), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(tids, att)
    return color, tfin, ncontrib


def _composite_tid_fwd(att, tids, tiles_x):
    color, tfin, ncontrib = _fwd_tid(att, tids, tiles_x)
    return (color, tfin), (att, tids, tfin, ncontrib)


def _composite_tid_bwd(tiles_x, res, cot):
    import numpy as np

    att, tids, tfin, ncontrib = res
    gcolor, gtfin = cot
    na, nt, k = att.shape
    n_chunks = k // CH
    v = pltpu.VMEM

    def tid_map(i, c, p):
        return (i, 0)

    def att_map(i, c, p):
        return (0, i, n_chunks - 1 - c)

    def pix2(i, c, p):
        return (i, p)

    def pix3(i, c, p):
        return (i, 0, p)

    datt = pl.pallas_call(
        functools.partial(_bwd_kernel_tid, tiles_x=tiles_x),
        grid=(nt // TB, n_chunks, P // PP),
        in_specs=[
            pl.BlockSpec((TB, 1), tid_map, memory_space=v),
            pl.BlockSpec((NA, TB, CH), att_map, memory_space=v),
            pl.BlockSpec((TB, 3, PP), pix3, memory_space=v),
            pl.BlockSpec((TB, PP), pix2, memory_space=v),
            pl.BlockSpec((TB, PP), pix2, memory_space=v),
            pl.BlockSpec((TB, PP), pix2, memory_space=v),
        ],
        out_specs=pl.BlockSpec((NA, TB, CH), att_map, memory_space=v),
        out_shape=jax.ShapeDtypeStruct((NA, nt, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TB, P), jnp.float32),
            pltpu.VMEM((TB, P), jnp.float32),
            pltpu.VMEM((TB, PP, CH), jnp.float32),
            pltpu.VMEM((TB, PP, CH), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(tids, att, gcolor, gtfin, tfin, ncontrib)
    dtids = np.zeros(tids.shape, dtype=jax.dtypes.float0)
    return (datt, dtids)


composite_tiles_tid.defvjp(_composite_tid_fwd, _composite_tid_bwd)


# One grid step per tile block with an UNROLLED internal chunk loop (the
# whole (TB, NA, K) attribute block VMEM-resident) instead of a chunk grid
# axis: 4x fewer grid steps — per-step fixed overhead was a large slice of
# kernel time at ~950 steps.
FUSED_CHUNKS = _os.environ.get("PCP_FUSED_CHUNKS", "0") == "1"


def _fwd_kernel_fused(att, color_ref, tfin_ref, ncontrib_ref,
                      t_scr, d_scr, nc_scr, *, tiles_x, n_chunks):
    rows01 = _block_rows(pl.program_id(0))
    px, py = _pix_coords(rows01, tiles_x)
    t_scr[:] = jnp.ones_like(t_scr)
    d_scr[:] = jnp.zeros_like(d_scr)
    nc_scr[:] = jnp.zeros_like(nc_scr)
    color_ref[:] = jnp.zeros_like(color_ref)

    def chunk_step(c_idx, _):
        # fori_loop (not Python unroll): Mosaic's stack allocator keeps
        # unrolled iterations' temporaries live simultaneously and blows
        # the 16 MB VMEM budget; a loop body reuses one set of buffers.
        @pl.when(jnp.min(d_scr[:]) < 0.5)
        def _compute():
            a = att[:, :, pl.ds(c_idx * CH, CH)]
            if USE_MXU_POWER:
                alpha = _local_alpha_mxu(a, rows01, tiles_x, 0, P)
            else:
                alpha, _, _ = _local_alpha(
                    _row(a, _I_MX), _row(a, _I_MY), _row(a, _I_CA),
                    _row(a, _I_CB), _row(a, _I_CC), _row(a, _I_OP),
                    _row(a, _I_VALID), px, py,
                )
            trans_in = t_scr[:]
            if USE_MXU_SCANS and USE_MXU_CUMPROD:
                prod_raw = _mxu_cumprod(1.0 - alpha)
            else:
                prod_raw = _cumprod_slots(1.0 - alpha)
            t_after_raw = trans_in[:, :, None] * prod_raw
            done_k = (d_scr[:][:, :, None] > 0.5) | (t_after_raw < T_EPS)
            alpha = jnp.where(done_k, 0.0, alpha)
            frozen = jnp.min(
                jnp.where(done_k, 1.0, prod_raw), axis=2, keepdims=True
            )
            prod_incl = jnp.where(done_k, frozen, prod_raw)
            t_excl = trans_in[:, :, None] * _shift_right_one(prod_incl, 1.0)
            w = alpha * t_excl

            color_ref[:] = color_ref[:] + jnp.stack(
                [
                    jnp.sum(w * _row(a, _I_R)[:, None, :], axis=2),
                    jnp.sum(w * _row(a, _I_G)[:, None, :], axis=2),
                    jnp.sum(w * _row(a, _I_B)[:, None, :], axis=2),
                ],
                axis=1,
            )
            applied = alpha > 0.0
            slot1 = (
                c_idx * CH
                + jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 2) + 1
            ).astype(jnp.float32)
            nc_scr[:] = jnp.maximum(
                nc_scr[:], jnp.max(jnp.where(applied, slot1, 0.0), axis=2)
            )
            t_scr[:] = trans_in * _last_slot(prod_incl)
            d_scr[:] = _last_slot(done_k.astype(jnp.float32))

        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_step, 0)
    tfin_ref[:] = t_scr[:]
    ncontrib_ref[:] = nc_scr[:]


def _bwd_kernel_fused(att, gcolor, gtfin, tfin, ncontrib, datt,
                      t_scr, s_scr, *, tiles_x, n_chunks):
    rows01 = _block_rows(pl.program_id(0))
    px, py = _pix_coords(rows01, tiles_x)
    t_scr[:] = tfin[:]
    s_scr[:] = tfin[:] * gtfin[:]
    gC = gcolor[:]
    nc_max = jnp.max(ncontrib[:])

    def chunk_step(c_rev, _):
        c_idx = n_chunks - 1 - c_rev
        ksl = pl.ds(c_idx * CH, CH)
        datt[:, :, ksl] = jnp.zeros((NA, TB, CH), jnp.float32)

        @pl.when((c_idx * CH).astype(jnp.float32) < nc_max)
        def _compute():
            at = att[:, :, ksl]
            if USE_MXU_POWER:
                alpha = _local_alpha_mxu(at, rows01, tiles_x, 0, P)
                # fused bwd keeps the dx/dy plane path below, so recompute
                # them cheaply (subs only; the quadratic moved to the MXU)
                dx = px[:, :, None] - _row(at, _I_MX)[:, None, :]
                dy = py[:, :, None] - _row(at, _I_MY)[:, None, :]
            else:
                alpha, dx, dy = _local_alpha(
                    _row(at, _I_MX), _row(at, _I_MY), _row(at, _I_CA),
                    _row(at, _I_CB), _row(at, _I_CC), _row(at, _I_OP),
                    _row(at, _I_VALID), px, py,
                )
            slot = (
                c_idx * CH
                + jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 2)
            ).astype(jnp.float32)
            alpha = jnp.where(slot < ncontrib[:][:, :, None], alpha, 0.0)

            t_end = t_scr[:]
            if USE_MXU_SCANS and USE_MXU_CUMPROD:
                suffix = _mxu_cumprod(1.0 - alpha, reverse=True)
            else:
                suffix = _cumprod_slots_rev(1.0 - alpha)
            t_excl = t_end[:, :, None] / suffix
            w = alpha * t_excl

            rgb_dot_g = (
                _row(at, _I_R)[:, None, :] * _gc_row(gC, 0)
                + _row(at, _I_G)[:, None, :] * _gc_row(gC, 1)
                + _row(at, _I_B)[:, None, :] * _gc_row(gC, 2)
            )
            contrib = w * rgb_dot_g
            if USE_MXU_SCANS:
                csuf = _mxu_cumsum(contrib, reverse=True)
            else:
                csuf = _cumsum_slots_rev(contrib)
            s_k = csuf - contrib + s_scr[:][:, :, None]

            denom = jnp.maximum(1.0 - alpha, 1.0 - ALPHA_MAX)
            dalpha = t_excl * rgb_dot_g - s_k / denom
            dalpha = jnp.where(alpha > 0.0, dalpha, 0.0)

            opb = jnp.maximum(_row(at, _I_OP)[:, None, :], ALPHA_MIN)
            g_val = alpha / opb
            unclamped = alpha < ALPHA_MAX
            dop_pix = jnp.where(unclamped, dalpha * g_val, 0.0)
            dpower = jnp.where(unclamped, dalpha * alpha, 0.0)

            ca3 = _row(at, _I_CA)[:, None, :]
            cb3 = _row(at, _I_CB)[:, None, :]
            cc3 = _row(at, _I_CC)[:, None, :]
            zero = jnp.zeros((1, dx.shape[0], dx.shape[2]), jnp.float32)
            planes = [
                jnp.sum(dpower * (ca3 * dx + cb3 * dy), axis=1)[None],
                jnp.sum(dpower * (cc3 * dy + cb3 * dx), axis=1)[None],
                jnp.sum(dpower * (-0.5 * dx * dx), axis=1)[None],
                jnp.sum(dpower * (-dx * dy), axis=1)[None],
                jnp.sum(dpower * (-0.5 * dy * dy), axis=1)[None],
                jnp.sum(w * _gc_row(gC, 0), axis=1)[None],
                jnp.sum(w * _gc_row(gC, 1), axis=1)[None],
                jnp.sum(w * _gc_row(gC, 2), axis=1)[None],
                jnp.sum(dop_pix, axis=1)[None],
            ] + [zero] * (NA - 9)
            datt[:, :, ksl] = jnp.concatenate(planes, axis=0)

            first = lambda x: jax.lax.slice_in_dim(x, 0, 1, axis=2)[:, :, 0]
            t_scr[:] = t_end / first(suffix)
            s_scr[:] = s_scr[:] + first(csuf)

        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_step, 0)


def _specs(n_chunks, reverse=False):
    """index_map returns BLOCK indices (units of the block shape)."""

    def att(i, c):
        return (0, i, (n_chunks - 1 - c) if reverse else c)

    def per_tile2(i, c):
        return (i, 0)

    def per_tile3(i, c):
        return (i, 0, 0)

    return att, per_tile2, per_tile3


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def composite_tiles(att, tiles_x):
    """Packed per-tile-slot attributes (NA, nt, K) -> (color (nt, 3, P),
    t_fin (nt, P)).

    Attribute planes (axis 0): [mx, my, conic_a, conic_b, conic_c, r, g,
    b, opacity]. nt must be a multiple of TB and K of CH (caller pads).
    PLANE-MAJOR: with NA on the outer axis the tiled (second-minor, minor)
    dims are (nt/TB, K) — full; any layout with 9 on a tiled dim pads it
    to 16 (sublane) or 128 (lane), multiplying every DMA, gather, and
    scatter byte by up to 14x (measured: the (slots, 9) class-reduce
    buffer cost ~1.9 GB/step).
    """
    color, tfin, _ = _fwd(att, tiles_x)
    return color, tfin


def _fwd(att, tiles_x):
    na, nt, k = att.shape
    n_chunks = k // CH
    att_map, per_tile2, per_tile3 = _specs(n_chunks)
    v = pltpu.VMEM
    if FUSED_CHUNKS:
        return pl.pallas_call(
            functools.partial(_fwd_kernel_fused, tiles_x=tiles_x,
                              n_chunks=n_chunks),
            grid=(nt // TB,),
            in_specs=[pl.BlockSpec((NA, TB, k), lambda i: (0, i, 0),
                                   memory_space=v)],
            out_specs=(
                pl.BlockSpec((TB, 3, P), lambda i: (i, 0, 0), memory_space=v),
                pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=v),
                pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=v),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nt, 3, P), jnp.float32),
                jax.ShapeDtypeStruct((nt, P), jnp.float32),
                jax.ShapeDtypeStruct((nt, P), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((TB, P), jnp.float32),
                pltpu.VMEM((TB, P), jnp.float32),
                pltpu.VMEM((TB, P), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the 16 MB scoped-vmem default is a soft limit; v5e has
                # 128 MB physical VMEM and the fused body's temporaries
                # need ~24 MB
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=INTERPRET,
        )(att)
    color, tfin, ncontrib = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x),
        grid=(nt // TB, n_chunks),
        in_specs=[pl.BlockSpec((NA, TB, CH), att_map, memory_space=v)],
        out_specs=(
            pl.BlockSpec((TB, 3, P), per_tile3, memory_space=v),
            pl.BlockSpec((TB, P), per_tile2, memory_space=v),
            pl.BlockSpec((TB, P), per_tile2, memory_space=v),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt, 3, P), jnp.float32),
            jax.ShapeDtypeStruct((nt, P), jnp.float32),
            jax.ShapeDtypeStruct((nt, P), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, P), jnp.float32),
            pltpu.VMEM((TB, P), jnp.float32),
            pltpu.VMEM((TB, P), jnp.float32),
            pltpu.VMEM((TB, P, CH), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(att)
    return color, tfin, ncontrib


def _composite_fwd(att, tiles_x):
    color, tfin, ncontrib = _fwd(att, tiles_x)
    return (color, tfin), (att, tfin, ncontrib)


def _composite_bwd(tiles_x, res, cot):
    att, tfin, ncontrib = res
    gcolor, gtfin = cot
    na, nt, k = att.shape
    n_chunks = k // CH
    v = pltpu.VMEM

    if FUSED_CHUNKS and PP == P:
        datt = pl.pallas_call(
            functools.partial(_bwd_kernel_fused, tiles_x=tiles_x,
                              n_chunks=n_chunks),
            grid=(nt // TB,),
            in_specs=[
                pl.BlockSpec((NA, TB, k), lambda i: (0, i, 0), memory_space=v),
                pl.BlockSpec((TB, 3, P), lambda i: (i, 0, 0), memory_space=v),
                pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=v),
                pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=v),
                pl.BlockSpec((TB, P), lambda i: (i, 0), memory_space=v),
            ],
            out_specs=pl.BlockSpec((NA, TB, k), lambda i: (0, i, 0),
                                   memory_space=v),
            out_shape=jax.ShapeDtypeStruct((NA, nt, k), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((TB, P), jnp.float32),
                pltpu.VMEM((TB, P), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the 16 MB scoped-vmem default is a soft limit; v5e has
                # 128 MB physical VMEM and the fused body's temporaries
                # need ~24 MB
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=INTERPRET,
        )(att, gcolor, gtfin, tfin, ncontrib)
        return (datt,)

    def att_map(i, c, p):
        return (0, i, n_chunks - 1 - c)

    def pix2(i, c, p):
        return (i, p)

    def pix3(i, c, p):
        return (i, 0, p)

    datt = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x),
        grid=(nt // TB, n_chunks, P // PP),
        in_specs=[
            pl.BlockSpec((NA, TB, CH), att_map, memory_space=v),
            pl.BlockSpec((TB, 3, PP), pix3, memory_space=v),
            pl.BlockSpec((TB, PP), pix2, memory_space=v),
            pl.BlockSpec((TB, PP), pix2, memory_space=v),
            pl.BlockSpec((TB, PP), pix2, memory_space=v),
        ],
        out_specs=pl.BlockSpec((NA, TB, CH), att_map, memory_space=v),
        out_shape=jax.ShapeDtypeStruct((NA, nt, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TB, P), jnp.float32),
            pltpu.VMEM((TB, P), jnp.float32),
            pltpu.VMEM((TB, PP, CH), jnp.float32),
            pltpu.VMEM((TB, PP, CH), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(att, gcolor, gtfin, tfin, ncontrib)
    return (datt,)


composite_tiles.defvjp(_composite_fwd, _composite_bwd)
