"""Differentiable tile-based Gaussian rasterizer (forward + autodiff backward).

TPU-native replacement for the reference's diff-gaussian-rasterization CUDA
extension. The CUDA forward composites front-to-back per pixel with early
termination (forward.cu:261-374 `renderCUDA`); the backward re-traverses
back-to-front accumulating gradients with `atomicAdd` (backward.cu:400-656).

Here the pipeline is:

  preprocess (projection.py)  ->  bin_gaussians (binning.py)  ->  composite

and ``composite`` expresses the sequential per-pixel loop as a `lax.scan`
over fixed-size Gaussian chunks with the transmittance as carry. Within a
chunk the front-to-back product becomes an exclusive cumulative sum of
log(1 - alpha) — fully vectorised VPU work. JAX autodiff through the scan
(with `jax.checkpoint` on the body so alphas are rematerialised, not stored)
yields a deterministic backward: the `atomicAdd` race of the CUDA version
becomes an ordinary (reproducible) reduction.

CUDA semantics preserved exactly:
  alpha = min(0.99, opacity * exp(power)); skipped if power > 0 or
  alpha < 1/255 (forward.cu:329-338); a pixel stops *before* the first
  contribution that would drop its transmittance below 1e-4 (:340-345),
  and the stop is sticky; final color = C + T * background (:365-373).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from pcp_tpu.ops.binning import (TileBins, bin_gaussians,
                                 bin_gaussians_levels)
from pcp_tpu.ops.projection import TILE, CameraIntrin, preprocess

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1.0e-4

# Backward-path knob for the per-Gaussian gradient reduction in
# composite_fused: "segsum" (default) = sort-based segment-sum backward
# (no scatter; see _gather_rows_segsum — measured 42.7 vs 46.1 ms/step);
# "add" = the batched per-plane gather's autodiff scatter-add onto the
# (NA, N) plane-major pack; "off" = replace the scatter with a cheap
# full-reduce that keeps the kernel VJP alive but produces garbage
# dpack — MEASUREMENT ONLY (tools/exp_step_parts3).
# A "class" variant (unique-slot scatter into expansion-slot space +
# dense per-class reductions, via PCP_SLOT_PAYLOAD=1 slot ids) was built
# and measured at 154 vs 72 ms/step — TPU lane-pads a (slots, 9) buffer
# minor dim to 128, ~1.9 GB of traffic — and removed; see PERF_NOTES.
import os as _os

_GRAD_SCATTER = _os.environ.get("PCP_GRAD_SCATTER", "auto")


def _grad_mode(m: int, n: int) -> str:
    """Pick the per-Gaussian gradient-reduction backend from the STATIC
    geometry (m = total table slots, n = capacity).

    Measured on v5e (PERF_NOTES rounds 3-4): segsum wins at the canonical
    bench (n=131k), and — after the round-4 single-position-gather fix —
    at reference scale too: full step 428.5 (segsum) vs 475.5 ms (add) at
    719k/1280x800/2^21, where the dup-index scatter-add is the largest op
    in the whole step (fusion.22 = 282.6 ms; ~100 ns per index against a
    (9, 2^21) output vs the 13.5 ns/idx it costs when the output fits
    scoped memory). The round-3 "segsum schedules pathologically at 2^21"
    anomaly (1081 ms) no longer reproduces post-fix. auto therefore picks
    segsum at every geometry; "add" stays for A/B via the env override.
    Also measured (round 4): pointing pad slots out-of-bounds so the
    scatter drops their exactly-zero updates did NOT pay (474.7 vs 475.5
    full step, forward gather regressed 106.9 -> 135.7 ms) — the
    emitter's cost is not executed-row-proportional.
    ``PCP_GRAD_SCATTER`` overrides ("segsum"/"add"/"off")."""
    if _GRAD_SCATTER != "auto":
        return _GRAD_SCATTER
    del m, n  # segsum measured faster at every probed geometry
    return "segsum"

# When True, rasterize(use_pallas=None) picks the XLA composite even on the
# TPU backend. Used by cross-device parity tools that run the same program
# on a CPU jax.Device inside a TPU-backend process (the Mosaic kernel can't
# lower for CPU devices outside interpret mode).
FORCE_XLA = False


@jax.custom_vjp
def _gather_rows_noscatter(pack, idc):
    return jax.vmap(lambda v: v[idc])(pack)


def _grns_fwd(pack, idc):
    return _gather_rows_noscatter(pack, idc), (pack.shape, idc.shape)


def _grns_bwd(res, g):
    import numpy as np

    pack_shape, idc_shape = res
    # reads g (keeps the kernel VJP alive) but does no scatter
    dpack = jnp.full(pack_shape, jnp.sum(g) * 1e-30, g.dtype)
    didc = np.zeros(idc_shape, dtype=jax.dtypes.float0)
    return dpack, didc


_gather_rows_noscatter.defvjp(_grns_fwd, _grns_bwd)


@jax.custom_vjp
def _gather_rows_segsum(pack, idc, counts, exact_ok):
    """Plane-major gather whose backward reduces per-Gaussian WITHOUT a
    duplicate-index scatter-add.

    XLA:TPU lowers the (nt*K)-index scatter-add of the gather's autodiff
    backward at ~13.5 ns/index (it internally sorts, then runs a serial
    per-index row-update loop) — 13.1 ms/step at bench scale, the single
    largest op in the step. The backward here is sort-based and fully
    vectorized; crucially it avoids BOTH scatters and searchsorted (a
    131k-query searchsorted is a 22-round while loop at ~0.9 ms/round —
    measured 19 ms, worse than the scatter it replaced):

      1. sort (key = 2*gid+1 for the nt*K pair slots CONCATENATED with one
         key = 2*gid sentinel per Gaussian; payload = position) — each
         sentinel lands immediately BEFORE its Gaussian's segment;
      2. gather the cotangent planes through the sorted payload (sentinels
         pull a zero column), one cumsum per plane;
      3. recover every sentinel's sorted position: when ``exact_ok`` (no
         binning drops, no tile saturation) every footprint pair reached
         the table, so sentinel i sits at i + sum(counts[:i]) + (window
         pads, all gid 0, for i >= 1) — plain cumsum of ``counts``.
         Otherwise fall back to a second (inverse-permutation) sort;
      4. per-Gaussian sums = differences of the exclusive prefix sums at
         consecutive sentinel positions.

    Accuracy: each Gaussian's gradient is a difference of two fp32 prefix
    sums whose magnitude can exceed the segment sum by ~sqrt(n_pairs), so
    the result carries ~1e-5 relative error vs the scatter's sequential
    accumulation — well inside the 1e-3 parity gate and far below bf16.

    ``counts`` is the per-Gaussian tile-footprint count (binning's pair
    expansion source of truth); ``exact_ok`` is a traced bool scalar.
    """
    return jax.vmap(lambda v: v[idc])(pack)


def _grss_fwd(pack, idc, counts, exact_ok):
    out = _gather_rows_segsum(pack, idc, counts, exact_ok)
    return out, (pack.shape[1], idc, counts, exact_ok)


# PCP_SEGSUM selects the segment-sum backend inside _grss_bwd:
#   "mosaic" (default)   — gid-sort + in-kernel one-hot-MXU accumulation
#                          (ops/segsum_pallas.sorted_segment_sum); TPU only,
#                          falls back to sentinel elsewhere. Measured at the
#                          719k/1280x800/2^21 scale point (round 5, same
#                          session, same auto geometry): full step 289.1 ms
#                          vs 389.5 (sentinel+hint) vs 428.5 (round-4
#                          sentinel); dpack rel err 3e-6 (split mode).
#   "sentinel"           — the round-3 sort+cumsum+position-gather chain
#                          (the CPU/interpret path, and the A/B reference).
_SEGSUM_IMPL = _os.environ.get("PCP_SEGSUM", "mosaic")


def _grss_bwd_mosaic(res, g):
    """Mosaic path: ONE m-element (gid, iota) sort, one gather into
    gid-sorted order, then the Pallas kernel reduces each contiguous
    segment with one-hot MXU matmuls — no cumsum over (9, m+n), no
    sentinel keys, no position gather."""
    import numpy as np

    from pcp_tpu.ops.segsum_pallas import sorted_segment_sum

    n, idc, counts, exact_ok = res
    del counts, exact_ok  # the kernel path always sorts; no shortcut
    na = g.shape[0]
    idc_flat = idc.reshape(-1).astype(jnp.int32)
    m = idc_flat.shape[0]
    s_gid, order = jax.lax.sort(
        (idc_flat, jnp.arange(m, dtype=jnp.int32)), num_keys=1,
        is_stable=False)
    gs = jnp.take(g.reshape(na, m), order, axis=1)
    dpack = sorted_segment_sum(
        gs, s_gid, n, mode=_os.environ.get("PCP_SEGSUM_PREC", "split"))
    didc = np.zeros(idc.shape, dtype=jax.dtypes.float0)
    dcounts = np.zeros(res[2].shape, dtype=jax.dtypes.float0)
    dok = np.zeros((), dtype=jax.dtypes.float0)
    return dpack, didc, dcounts, dok


def _grss_bwd(res, g):
    import numpy as np

    if (_SEGSUM_IMPL == "mosaic" and jax.default_backend() == "tpu"
            and not FORCE_XLA):
        n_cap = res[0]
        if n_cap % 256 == 0:
            return _grss_bwd_mosaic(res, g)

    n, idc, counts, exact_ok = res
    na = g.shape[0]
    idc_flat = idc.reshape(-1).astype(jnp.int32)
    m = idc_flat.shape[0]

    keys = jnp.concatenate(
        [idc_flat * 2 + 1, jnp.arange(n, dtype=jnp.int32) * 2])
    pay = jnp.arange(m + n, dtype=jnp.int32)
    _, s_pay = jax.lax.sort((keys, pay), num_keys=1, is_stable=False)

    # cotangents in sorted order; sentinel rows (payload >= m) pull the
    # zero pad column
    g_pad = jnp.concatenate(
        [g.reshape(na, m), jnp.zeros((na, 1), g.dtype)], axis=1)
    gs = jnp.take(g_pad, jnp.minimum(s_pay, m), axis=1)
    ecs = jnp.pad(jnp.cumsum(gs, axis=1), ((0, 0), (1, 0)))  # exclusive

    def pos_from_counts(_):
        # Sentinel i's sorted position = i sentinels before it + all pairs
        # of gids < i. Valid only when every footprint pair reached the
        # window table (exact_ok): then gid g owns exactly counts[g] table
        # slots, except gid 0 which also absorbs every -1->0-clamped
        # window pad slot.
        c = counts.astype(jnp.int32)
        ecounts = jnp.pad(jnp.cumsum(c)[:n - 1], (1, 0))     # sum counts[:i]
        pads = m - jnp.sum(c)
        i = jnp.arange(n, dtype=jnp.int32)
        return i + ecounts + jnp.where(i >= 1, pads, 0)

    def pos_from_sort(_):
        # inverse permutation: where did concat position p land in the
        # sort? (needed whenever drops/saturation broke the counts)
        _, inv = jax.lax.sort(
            (s_pay, jnp.arange(m + n, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        return inv[m:]

    pos = jax.lax.cond(exact_ok, pos_from_counts, pos_from_sort, None)
    pos_ext = jnp.concatenate([pos, jnp.full((1,), m + n, jnp.int32)])
    # ONE gather at the n+1 sentinel positions, then adjacent differences —
    # written as two position gathers (ecs[:, pos_ext[1:]] -
    # ecs[:, pos_ext[:-1]]) XLA emits TWO ~30 ns/index column gathers over
    # n indices each (2 x 64 ms at 2^21 capacity, the largest ops in the
    # scale-point step); the shifted index sets differ so nothing CSEs.
    # pos_ext is strictly increasing by construction (both branches), so
    # the gather may carry the sorted/in-bounds hints; PCP_POSGATHER_HINT=0
    # restores the plain take for A/B.
    if _os.environ.get("PCP_POSGATHER_HINT", "1") != "0":
        sg = ecs.at[:, pos_ext].get(
            indices_are_sorted=True, mode="promise_in_bounds")
    else:
        sg = jnp.take(ecs, pos_ext, axis=1)
    dpack = sg[:, 1:] - sg[:, :-1]
    didc = np.zeros(idc.shape, dtype=jax.dtypes.float0)
    dcounts = np.zeros(counts.shape, dtype=jax.dtypes.float0)
    dok = np.zeros((), dtype=jax.dtypes.float0)
    return dpack, didc, dcounts, dok


_gather_rows_segsum.defvjp(_grss_fwd, _grss_bwd)


def _chunk_body(carry, chunk, *, n_pix):
    """Composite one chunk of Gaussians into all tiles of a batch.

    carry: (color (B,P,3), transmittance (B,P), done (B,P) bool)
    chunk: dict of per-chunk gathered Gaussian data + pixel coords.
    """
    color, trans, done = carry
    mean = chunk["mean"]          # (B, CH, 2)
    conic = chunk["conic"]        # (B, CH, 3)
    rgb = chunk["rgb"]            # (B, CH, 3)
    opac = chunk["opac"]          # (B, CH)
    valid = chunk["valid"]        # (B, CH)
    pix = chunk["pix"]            # (B, P, 2)

    d = pix[:, None, :, :] - mean[:, :, None, :]          # (B, CH, P, 2)
    dx, dy = d[..., 0], d[..., 1]
    a = conic[..., 0:1]
    b = conic[..., 1:2]
    c = conic[..., 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy  # (B, CH, P)
    alpha = jnp.minimum(ALPHA_MAX, opac[..., None] * jnp.exp(power))
    alpha = jnp.where(
        (power > 0.0) | (alpha < ALPHA_MIN) | ~valid[..., None], 0.0, alpha
    )

    # Sticky early-stop (forward.cu:340-345): contribution k is skipped if
    # T after it would fall below 1e-4; thereafter the pixel is done.
    log1ma = jnp.log1p(-alpha)                              # (B, CH, P)
    t_after_raw = trans[:, None, :] * jnp.exp(jnp.cumsum(log1ma, axis=1))
    newly_done = t_after_raw < T_EPS
    done_k = done[:, None, :] | (jnp.cumsum(newly_done, axis=1) > 0)
    alpha = jnp.where(done_k, 0.0, alpha)

    log1ma = jnp.log1p(-alpha)
    cum = jnp.cumsum(log1ma, axis=1)
    t_excl = trans[:, None, :] * jnp.exp(cum - log1ma)      # T before k
    w = alpha * t_excl                                      # (B, CH, P)
    # HIGHEST: this is the reference/parity path — keep it fp32-exact on
    # TPU (default bf16 operand rounding costs ~1e-3 in the blend).
    color = color + jnp.einsum("bkp,bkc->bpc", w, rgb,
                               precision=jax.lax.Precision.HIGHEST)
    trans = trans * jnp.exp(cum[:, -1, :])
    done = done_k[:, -1, :]
    return (color, trans, done), None


MEM_BUDGET_BYTES = 1 << 31  # ~2 GB of transient HBM for the alpha tensors


def composite(
    prep: Dict[str, jnp.ndarray],
    bins: TileBins,
    image_size,
    background: jnp.ndarray,
    *,
    chunk: int = 64,
    tile_batch: int = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite binned Gaussians into an image.

    Returns (image (H, W, 3) in [0, inf), final_T (H, W)).

    The sequential axis is ONLY the Gaussian-chunk scan (front-to-back order
    matters); all tiles advance in parallel per step. ``tile_batch=None``
    sizes the tile dimension automatically so the per-step alpha tensor
    (tiles x chunk x pixels, ~8 temporaries) fits MEM_BUDGET_BYTES — on a
    16 GB chip a full 1080p tile grid runs in 1-3 batches, keeping the
    number of sequential steps minimal (latency, not FLOPs, bounds this op).
    """
    w, h = int(image_size[0]), int(image_size[1])
    tiles_x = (w + TILE - 1) // TILE
    tiles_y = (h + TILE - 1) // TILE
    num_tiles = tiles_x * tiles_y
    k_cap = bins.tile_gauss.shape[1]
    n_chunks = (k_cap + chunk - 1) // chunk
    p = TILE * TILE
    if tile_batch is None:
        per_tile_bytes = chunk * p * 4 * 8
        tile_batch = max(64, min(num_tiles, MEM_BUDGET_BYTES // per_tile_bytes))

    # Pad tile count to a multiple of tile_batch.
    nt_pad = ((num_tiles + tile_batch - 1) // tile_batch) * tile_batch
    tg = jnp.full((nt_pad, n_chunks * chunk), -1, jnp.int32)
    tg = tg.at[:num_tiles, :k_cap].set(bins.tile_gauss)
    tg = tg.reshape(nt_pad // tile_batch, tile_batch, n_chunks, chunk)

    # Per-tile pixel centers (+0.5 like ndc2Pix, auxiliary.h:41-44... the
    # CUDA kernel uses integer pix coords; means2d are already in the same
    # pixel frame, so use integer coordinates to match renderCUDA:302-305).
    tile_ids = jnp.arange(nt_pad)
    tx0 = (tile_ids % tiles_x) * TILE
    ty0 = (tile_ids // tiles_x) * TILE
    py, px = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    pix = jnp.stack(
        [tx0[:, None] + px.reshape(-1)[None, :], ty0[:, None] + py.reshape(-1)[None, :]],
        axis=-1,
    ).astype(jnp.float32)                                   # (nt_pad, P, 2)
    pix = pix.reshape(nt_pad // tile_batch, tile_batch, p, 2)

    means2d = prep["means2d"]
    conics = prep["conics"]
    rgb = prep["rgb"]
    opac = prep["opacity"]

    body = jax.checkpoint(functools.partial(_chunk_body, n_pix=p))

    def render_batch(args):
        tg_b, pix_b = args  # (B, n_chunks, CH), (B, P, 2)

        def scan_body(carry, idx):
            iv = idx >= 0
            ic = jnp.maximum(idx, 0)
            chunk_data = {
                "mean": means2d[ic],
                "conic": conics[ic],
                "rgb": rgb[ic],
                "opac": opac[ic],
                "valid": iv,
                "pix": pix_b,
            }
            return body(carry, chunk_data)

        init = (
            jnp.zeros((tile_batch, p, 3), jnp.float32),
            jnp.ones((tile_batch, p), jnp.float32),
            jnp.zeros((tile_batch, p), bool),
        )
        (color, trans, _), _ = jax.lax.scan(
            scan_body, init, jnp.swapaxes(tg_b, 0, 1)
        )
        return color, trans

    if tg.shape[0] == 1:
        c1, t1 = render_batch((tg[0], pix[0]))
        color, trans = c1[None], t1[None]
    else:
        color, trans = jax.lax.map(render_batch, (tg, pix))
    color = color.reshape(nt_pad, p, 3)
    trans = trans.reshape(nt_pad, p)

    # Un-tile: (nt, P, 3) -> (H_pad, W_pad, 3) -> crop.
    def untile(x):
        ch = x.shape[-1] if x.ndim == 3 else 1
        x = x.reshape(nt_pad, TILE, TILE, ch)[:num_tiles]
        x = x.reshape(tiles_y, tiles_x, TILE, TILE, ch)
        x = x.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE, tiles_x * TILE, ch)
        return x[:h, :w]

    image = untile(color) + untile(trans[..., None]) * background.reshape(1, 1, 3)
    return image, untile(trans[..., None])[..., 0]


def composite_fused(
    prep: Dict[str, jnp.ndarray],
    bins: TileBins,
    image_size,
    background: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-Pallas composite path (ops/pallas_composite.py): pre-gather
    per-tile attribute planes with XLA, run the VMEM-resident blend kernel,
    un-tile. Differentiable via the kernel's custom VJP; per-Gaussian
    gradient accumulation is JAX's deterministic scatter-add through the
    gathers below."""
    from pcp_tpu.ops import pallas_composite as pc

    w, h = int(image_size[0]), int(image_size[1])
    tiles_x = (w + TILE - 1) // TILE
    tiles_y = (h + TILE - 1) // TILE
    num_tiles = tiles_x * tiles_y

    ids = bins.tile_gauss
    nt, k = ids.shape
    nt_pad = ((nt + pc.TB - 1) // pc.TB) * pc.TB
    k_pad = ((k + pc.CH - 1) // pc.CH) * pc.CH
    if (nt_pad, k_pad) != (nt, k):
        ids = jnp.full((nt_pad, k_pad), -1, jnp.int32).at[:nt, :k].set(ids)
    valid = (ids >= 0).astype(jnp.float32)

    # PLANE-MAJOR attribute pack (NA, N) and a batched per-plane gather to
    # the kernel's (NA, nt, K) layout. Any (.., NA=9)-minor intermediate
    # (the old (N, 9) pack / (nt*K, 9) row gather / its transpose) gets its
    # minor dim lane-padded 9 -> 128 on TPU, multiplying every HBM byte by
    # ~14x; plane-major keeps the tiled dims (nt, K) full in both the
    # gather and its backward scatter-add (which lands on (NA, N)).
    m = prep["means2d"]
    c = prep["conics"]
    rgb = prep["rgb"]
    n = m.shape[0]
    pack = jnp.stack(
        [m[:, 0], m[:, 1], c[:, 0], c[:, 1], c[:, 2],
         rgb[:, 0], rgb[:, 1], rgb[:, 2], prep["opacity"]],
    )                                               # (NA=9, N)
    mode = _grad_mode(ids.size, pack.shape[1])
    idc = jnp.maximum(ids, 0)
    if mode == "off":
        att = _gather_rows_noscatter(pack, idc)
    elif mode == "segsum":
        # per-Gaussian footprint counts (same formula as binning's pair
        # expansion) let the backward skip its inverse-permutation sort
        # whenever nothing was dropped (the honest-bench operating point)
        rect = prep["rect"]
        counts = ((rect[:, 2] - rect[:, 0])
                  * (rect[:, 3] - rect[:, 1])).astype(jnp.int32)
        exact_ok = (bins.n_dropped == 0) & (bins.max_tile_load <= k)
        att = _gather_rows_segsum(pack, idc, counts, exact_ok)
    else:
        att = jax.vmap(lambda v: v[idc])(pack)      # (NA, nt, K)
    att = att * valid[None]                         # pads: opacity/valid -> 0
    color, tfin = pc.composite_tiles(att, tiles_x)

    def untile(x, ch):
        x = x.reshape(nt_pad, ch, TILE, TILE)[:num_tiles]
        x = x.reshape(tiles_y, tiles_x, ch, TILE, TILE)
        x = x.transpose(0, 3, 1, 4, 2).reshape(tiles_y * TILE, tiles_x * TILE, ch)
        return x[:h, :w]

    color_img = untile(color, 3)
    t_img = untile(tfin[:, None, :], 1)[..., 0]
    image = color_img + t_img[..., None] * background.reshape(1, 1, 3)
    return image, t_img


def _pack_planes(prep):
    """Plane-major (NA, N) attribute pack for the fused composite."""
    m = prep["means2d"]
    c = prep["conics"]
    rgb = prep["rgb"]
    return jnp.stack(
        [m[:, 0], m[:, 1], c[:, 0], c[:, 1], c[:, 2],
         rgb[:, 0], rgb[:, 1], rgb[:, 2], prep["opacity"]],
    )


def composite_fused_levels(
    prep: Dict[str, jnp.ndarray],
    bins,                     # binning.TileBinsLevels
    image_size,
    background: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """N-level fused composite: one kernel pass over the dense
    (num_tiles, k0) base plus one per compact (t_i, k_i) level table
    (explicit tile ids), merged by scatter. Total table slots — and with
    them the attribute gather, kernel DMA, gradient table, and segment-sum
    backward — track the tile-load DISTRIBUTION instead of
    num_tiles * max load (see binning.TileBinsLevels)."""
    from pcp_tpu.ops import pallas_composite as pc

    w, h = int(image_size[0]), int(image_size[1])
    tiles_x = (w + TILE - 1) // TILE
    tiles_y = (h + TILE - 1) // TILE
    num_tiles = tiles_x * tiles_y

    def pad_tbl(ids):
        nt, k = ids.shape
        ntp = ((nt + pc.TB - 1) // pc.TB) * pc.TB
        kp = ((k + pc.CH - 1) // pc.CH) * pc.CH
        if (ntp, kp) != (nt, k):
            ids = jnp.full((ntp, kp), -1, jnp.int32).at[:nt, :k].set(ids)
        return ids

    tbls = [pad_tbl(bins.base)] + [pad_tbl(t) for t in bins.tables]
    nt_pad = tbls[0].shape[0]
    tids = [jnp.arange(nt_pad, dtype=jnp.int32)]
    for ids_i in bins.ids:
        tp = tbls[len(tids)].shape[0]
        if tp != ids_i.shape[0]:
            ids_i = jnp.full((tp,), -1, jnp.int32).at[:ids_i.shape[0]].set(
                ids_i)
        tids.append(ids_i)

    # ONE fused gather (and ONE segment-sum backward) over all tables
    idc_cat = jnp.concatenate(
        [jnp.maximum(t, 0).reshape(-1) for t in tbls])
    pack = _pack_planes(prep)
    mode = _grad_mode(idc_cat.size, pack.shape[1])
    if mode == "off":
        att_cat = _gather_rows_noscatter(pack, idc_cat)
    elif mode == "segsum":
        # Every footprint pair lands in EXACTLY ONE table (a tile lives in
        # exactly one level), so in the zero-drop case the per-Gaussian
        # slot counts over the CONCATENATED tables are still the footprint
        # counts and the sentinel-position formula holds (pads are
        # gid-0-clamped in every table). The inverse-permutation sort is
        # only needed when something was dropped/truncated.
        rect = prep["rect"]
        counts = ((rect[:, 2] - rect[:, 0])
                  * (rect[:, 3] - rect[:, 1])).astype(jnp.int32)
        k_top = tbls[-1].shape[1] if bins.tables else tbls[0].shape[1]
        exact_ok = ((bins.n_dropped == 0)
                    & (bins.max_tile_load <= k_top))
        att_cat = _gather_rows_segsum(pack, idc_cat, counts, exact_ok)
    else:
        att_cat = jax.vmap(lambda v: v[idc_cat])(pack)

    color = None
    tfin = None
    off = 0
    for lvl, (tbl, tid) in enumerate(zip(tbls, tids)):
        tp, kp = tbl.shape
        m = tp * kp
        att = att_cat[:, off:off + m].reshape(pc.NA, tp, kp)
        att = att * (tbl >= 0).astype(jnp.float32)[None]
        off += m
        c_l, t_l = pc.composite_tiles_tid(
            att, jnp.maximum(tid, 0)[:, None], tiles_x)
        if lvl == 0:
            color, tfin = c_l, t_l
        else:
            safe = jnp.where(tid >= 0, tid, nt_pad)   # OOB rows -> dropped
            color = color.at[safe].set(c_l, mode="drop")
            tfin = tfin.at[safe].set(t_l, mode="drop")

    def untile(x, ch):
        x = x.reshape(nt_pad, ch, TILE, TILE)[:num_tiles]
        x = x.reshape(tiles_y, tiles_x, ch, TILE, TILE)
        x = x.transpose(0, 3, 1, 4, 2).reshape(
            tiles_y * TILE, tiles_x * TILE, ch)
        return x[:h, :w]

    color_img = untile(color, 3)
    t_img = untile(tfin[:, None, :], 1)[..., 0]
    image = color_img + t_img[..., None] * background.reshape(1, 1, 3)
    return image, t_img


def rasterize(
    xyz,
    scales,
    quats,
    opacities,
    sh,
    viewmat,
    intrin: CameraIntrin,
    image_size,
    background,
    sh_degree: int,
    *,
    max_pairs: int = None,
    max_per_tile: int = 512,
    tile_k_lo: int = 0,
    tile_hi_cap: int = 0,
    tile_levels=(),
    active_cap: int = 0,
    pair_levels=(),
    chunk: int = 64,
    tile_batch: int = None,
    means2d_offset=None,
    tan_fov=None,
    use_pallas: bool = None,
):
    """Full differentiable rasterization: preprocess -> bin -> composite.

    Mirrors the reference `render()` front-end (gaussian_renderer/
    __init__.py:18-100). Returns (image (H,W,3), aux dict with radii,
    visible mask, final transmittance, and intersection count).
    """
    w, h = int(image_size[0]), int(image_size[1])
    tiles_x = (w + TILE - 1) // TILE
    tiles_y = (h + TILE - 1) // TILE
    n = xyz.shape[0]
    if max_pairs is None:
        max_pairs = max(8 * n, 1 << 16)

    prep = preprocess(
        xyz, scales, quats, opacities, sh, viewmat, intrin, image_size,
        sh_degree, tan_fov=tan_fov, means2d_offset=means2d_offset,
    )
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and not FORCE_XLA
    levels = tuple(tile_levels)
    if not levels and tile_hi_cap > 0 and 0 < tile_k_lo < max_per_tile:
        levels = ((max_per_tile, tile_hi_cap),)
    if use_pallas and levels and tile_k_lo > 0:
        bins = bin_gaussians_levels(
            prep["rect"], prep["depths"], tiles_x, tiles_y,
            k0=tile_k_lo, levels=levels, active_cap=active_cap,
            pair_levels=pair_levels,
        )
        image, final_t = composite_fused_levels(
            prep, bins, image_size, background)
    else:
        bins = bin_gaussians(
            prep["rect"], prep["depths"], tiles_x, tiles_y,
            max_pairs=max_pairs, max_per_tile=max_per_tile,
            active_cap=active_cap, pair_levels=pair_levels,
        )
        if use_pallas:
            image, final_t = composite_fused(
                prep, bins, image_size, background)
        else:
            image, final_t = composite(
                prep, bins, image_size, background, chunk=chunk,
                tile_batch=tile_batch,
            )
    aux = {
        "radii": prep["radii"],
        "visible": prep["visible"],
        "final_t": final_t,
        "n_pairs": bins.n_pairs,
        "tile_count": bins.tile_count,
        "max_tile_load": bins.max_tile_load,
        "n_dropped": bins.n_dropped,
    }
    return image, aux
