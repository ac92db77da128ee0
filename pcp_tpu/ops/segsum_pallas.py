"""Mosaic sorted-segment-sum: per-Gaussian gradient reduction as a TPU
kernel (the round-4 roofline's named "next structural lever").

Problem shape: the composite backward produces one gradient column per
TABLE SLOT (NA=9 planes x M slots, M ~ 12-19M at reference scale) and
must reduce them per Gaussian into a (NA, N) pack (N = slot capacity,
2^21 at scale). The CUDA reference does this with `atomicAdd`
(backward.cu:400-656); XLA's scatter-add lowers to a ~13.5-100 ns/index
serial loop, and the round-3/4 sort-based segment sum (rasterize.py
`_gather_rows_segsum`) replaced it with sort + cumsum + position
gathers — still ~100+ ms of per-element XLA lowerings at scale.

This kernel takes the columns ALREADY SORTED by Gaussian id (the sort
stays in XLA — its (key, payload) form is well-lowered) and reduces
each gid's contiguous segment with MXU one-hot matmuls:

  grid block i owns output gids [i*GB, (i+1)*GB); its input columns are
  the contiguous range [bounds[i], bounds[i+1]) (bounds = searchsorted
  of the sorted gids at block edges, scalar-prefetched); the block
  streams that range in (NA, C) chunks, builds a (C, GB) one-hot of
  (gid - i*GB), and accumulates chunk @ one-hot into a VMEM (NA, GB)
  accumulator — placement-by-matmul, no scatter, no per-element op.

The one-hot is exact in bf16, so the matmul can run at the MXU's bf16
rate with f32 accumulation; ``precision`` selects f32 operands instead
when bit-parity with the XLA path matters more than the ~4x rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NA = 9          # attribute planes (mx my ca cb cc r g b op)
GB = 256        # output gids per grid block
CHUNK = 2048    # input columns per inner step


def _kernel(bounds_ref, gs_hbm, gid_hbm, out_ref, acc, gs_scr, gid_scr,
            sems, *, na, gb, chunk, mode):
    i = pl.program_id(0)
    # chunk-align the range start: Mosaic must PROVE the HBM slice
    # offset divisible by the lane tiling, so DMA from chunk multiples
    # and let the one-hot's range check drop the leading columns that
    # belong to the previous block (their rel-gid is negative).
    lo = pl.multiple_of(
        (bounds_ref[i] // chunk) * chunk, chunk)
    hi = bounds_ref[i + 1]
    base = i * gb
    nchunks = jax.lax.div(hi - lo + chunk - 1, chunk)

    acc[...] = jnp.zeros_like(acc)

    def dma(slot, c):
        start = pl.multiple_of(lo + c * chunk, chunk)
        return (
            pltpu.make_async_copy(
                gs_hbm.at[:, pl.ds(start, chunk)], gs_scr.at[slot],
                sems.at[0, slot]),
            pltpu.make_async_copy(
                gid_hbm.at[:, pl.ds(start, chunk)], gid_scr.at[slot],
                sems.at[1, slot]),
        )

    @pl.when(nchunks > 0)
    def _():
        for cp in dma(0, 0):
            cp.start()

    def body(c, _):
        slot = jax.lax.rem(c, 2)
        start = lo + c * chunk

        @pl.when(c + 1 < nchunks)
        def _():
            for cp in dma(1 - slot, c + 1):
                cp.start()

        for cp in dma(slot, c):
            cp.wait()
        # one-hot in (gb, chunk) orientation: the (1, chunk) gid row
        # broadcasts along sublanes (Mosaic can't lane<->sublane reshape
        # i1 vectors), and the matmul contracts dim 1 of BOTH operands
        # so no operand ever needs an explicit transpose/reshape here.
        col = jax.lax.broadcasted_iota(jnp.int32, (gb, chunk), 1)
        valid = (start + col) < hi                       # (gb, chunk)
        rel = gid_scr[slot] - base                       # (1, chunk)
        iota_g = jax.lax.broadcasted_iota(jnp.int32, (gb, chunk), 0)
        onehot = (rel == iota_g) & valid                 # (gb, chunk)
        gs_c = gs_scr[slot]

        def mm(x):
            return jax.lax.dot_general(
                x, onehot.astype(x.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        if mode == "bf16":
            acc[...] += mm(gs_c.astype(jnp.bfloat16))
        elif mode == "split":
            # error-compensated bf16: hi = round(g), lo = g - hi exactly
            # representable; two bf16-rate matmuls recover ~16 mantissa
            # bits (the one-hot is exact in bf16)
            g_hi = gs_c.astype(jnp.bfloat16)
            g_lo = (gs_c - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc[...] += mm(g_hi) + mm(g_lo)
        else:  # f32: force full-precision operand passes
            acc[...] += jax.lax.dot_general(
                gs_c, onehot.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        return _

    jax.lax.fori_loop(0, nchunks, body, None)
    out_ref[...] = acc[...]


def sorted_segment_sum(gs, s_gid, n, *, gb=GB, chunk=CHUNK, mode="split",
                       interpret=False):
    """Segment-sum of gid-sorted columns.

    gs: (NA, M) f32 — gradient columns in nondecreasing-gid order.
    s_gid: (M,) int32 — the sorted gids, values in [0, n) (pads may use
        >= n; they are ignored).
    n: static output width (slot capacity). Returns (NA, M->n) f32.
    mode: "bf16" (fastest, ~2e-3 rel err), "split" (default:
        error-compensated two-pass bf16, ~1e-5 rel err at 2x matmul
        cost), or "f32" (Precision.HIGHEST operand passes).
    """
    na, m = gs.shape
    assert n % gb == 0, (n, gb)
    nb = n // gb
    # pad the plane axis to a sublane multiple (Mosaic HBM slices must be
    # 8-aligned in dim 0) and the column axis so the last chunk's DMA
    # stays in bounds
    nap = ((na + 7) // 8) * 8
    mp = m + chunk
    gs_p = jnp.zeros((nap, mp), gs.dtype).at[:na, :m].set(gs)
    gid_p = jnp.full((1, mp), n, jnp.int32).at[0, :m].set(s_gid)

    edges = jnp.arange(0, n + 1, gb, dtype=jnp.int32)
    bounds = jnp.searchsorted(s_gid, edges, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((nap, gb), lambda i, b: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((nap, gb), jnp.float32),
            pltpu.VMEM((2, nap, chunk), gs.dtype),
            pltpu.VMEM((2, 1, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kern = functools.partial(_kernel, na=nap, gb=gb, chunk=chunk, mode=mode)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nap, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bounds, gs_p, gid_p)[:na]
