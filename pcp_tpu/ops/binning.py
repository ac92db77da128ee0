"""Tile binning: Gaussian x tile intersection keys -> per-tile depth-sorted
Gaussian lists, with static shapes.

Replaces the reference's dynamic CUB pipeline (rasterizer_impl.cu:70-138:
InclusiveSum over tiles_touched -> duplicateWithKeys -> DeviceRadixSort on
[tileID|depth] 64-bit keys -> identifyTileRanges) with XLA-friendly ops,
shaped by TPU microbenchmarks (each pitfall below cost 100-400 ms/step at
2M pairs before being designed out):

1. Gaussians expand in GLOBAL near-to-far depth order (one N-argsort of
   raw depth-float bits — monotonic for positives, the CUDA
   radix-sort-the-raw-bits trick, rasterizer_impl.cu:90), so grouping by
   tile while preserving pair order IS per-tile depth sorting. The fast
   path therefore sorts ONE uint32 [tile | pair-rank] array — no payload:
   a (key, payload) lax.sort costs ~11x a single-array sort on TPU. The
   fallback (when tile_bits + pair_bits > 32) packs [tile | depth bits]
   and carries the Gaussian id as payload.
2. Pair expansion maps slot -> owning Gaussian with a scatter of span starts
   + one associative cummax (a searchsorted here serializes into ~17 gather
   rounds over max_pairs queries: ~0.5 s).
3. Per-pair tile coordinates avoid variable integer div/mod (no hardware
   int division) via float reciprocal with a +0.5 numerator guard — exact
   for the < 2^20 operand ranges involved.
4. All per-Gaussian lookups ride ONE packed (max_pairs, 5) gather.

Overflow policy: Gaussians are expanded in NEAR-TO-FAR depth order, so pairs
beyond ``max_pairs`` drop the *farthest* Gaussians (not arbitrary indices);
per-tile lists likewise keep the nearest ``max_per_tile``. Callers detect
total overflow via ``n_pairs`` and per-tile saturation via ``max_tile_load``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


import os as _os

# [tile|depth]+payload sort is the DEFAULT: although a standalone payload
# sort measures ~11x slower than a single-array sort, in the full program
# the single-sort path ([tile|pair-rank] + id-recovery gather) benches
# 0.9 iters/s SLOWER end-to-end. Set PCP_PAIR_SORT=0 for the fast-path A/B.
FORCE_PAIR_SORT = _os.environ.get("PCP_PAIR_SORT", "1") == "1"
DEPTH_ORDER_EXPANSION = _os.environ.get("PCP_DEPTH_ORDER", "1") == "1"

# Window extraction: "slice" = vmap dynamic_slice (num_tiles contiguous
# K-row DMA copies); "gather" = one (nt, K) element gather at
# starts[:, None] + arange(K). A/B knob — the slice path issues ~2k small
# async DMAs per step which show up as sustained DMA-queue pressure.
WINDOW_MODE = _os.environ.get("PCP_WINDOW", "slice")

class TileBins(NamedTuple):
    tile_gauss: jnp.ndarray   # (num_tiles, max_per_tile) int32 gauss ids; -1 pad
    tile_count: jnp.ndarray   # (num_tiles,) int32 live entries per tile
    n_pairs: jnp.ndarray      # () int32 total intersections (pre-cap)
    max_tile_load: jnp.ndarray  # () int32 max pre-clamp per-tile occupancy
    n_dropped: jnp.ndarray = 0  # () int32 pairs lost to static caps
    #   (v1: global max_pairs overflow; v2: class-capacity/footprint drops —
    #    per-tile clamping to max_per_tile is NOT counted here, it is the
    #    nearest-K policy reported via max_tile_load)


def _ceil_log2(x: int) -> int:
    return max(1, (x - 1).bit_length())


BINNING_VERSION = _os.environ.get("PCP_BINNING", "v2")


def bin_gaussians(
    rect: jnp.ndarray,      # (N, 4) int32 tile bounds [x0,y0,x1,y1)
    depths: jnp.ndarray,    # (N,) camera-space depths
    tiles_x: int,
    tiles_y: int,
    max_pairs: int,
    max_per_tile: int,
    active_cap: int = 0,
    pair_levels=(),
) -> TileBins:
    if BINNING_VERSION == "v2":
        return bin_gaussians_v2(rect, depths, tiles_x, tiles_y, max_per_tile,
                                active_cap, pair_levels)
    return _bin_gaussians_v1(rect, depths, tiles_x, tiles_y, max_pairs,
                             max_per_tile)


def _bin_gaussians_v1(
    rect: jnp.ndarray,
    depths: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    max_pairs: int,
    max_per_tile: int,
) -> TileBins:
    n = rect.shape[0]
    num_tiles = tiles_x * tiles_y
    tile_bits = _ceil_log2(num_tiles + 1)
    depth_bits = 32 - tile_bits
    assert tile_bits <= 16, f"{num_tiles} tiles won't fit the packed key"

    wx = rect[:, 2] - rect[:, 0]
    wy = rect[:, 3] - rect[:, 1]
    counts = (wx * wy).astype(jnp.int32)

    # Depth key = top bits of the float32 pattern (monotonic for positive
    # floats — exactly the CUDA trick of radix-sorting raw depth bits,
    # rasterizer_impl.cu:90; valid pairs all have depth > NEAR_PLANE > 0).
    # No rank table, no post-sort id translation.
    dq = (
        jax.lax.bitcast_convert_type(depths.astype(jnp.float32), jnp.uint32)
        >> jnp.uint32(32 - depth_bits)
    )

    # Expand pairs in NEAR-TO-FAR Gaussian order so a max_pairs overflow
    # drops the farthest Gaussians, not arbitrary indices. One N-argsort
    # over the capacity axis. PCP_DEPTH_ORDER=0 disables for A/B timing
    # (overflow then drops by Gaussian index like the round-1 code).
    if DEPTH_ORDER_EXPANSION:
        perm = jnp.argsort(
            jnp.where(counts > 0, dq, jnp.uint32(0xFFFFFFFF))
        ).astype(jnp.int32)
    else:
        perm = jnp.arange(n, dtype=jnp.int32)
    counts_p = counts[perm]
    offsets_p = jnp.cumsum(counts_p) - counts_p
    total = offsets_p[-1] + counts_p[-1] if n > 0 else jnp.int32(0)

    # --- pair slot -> owning (depth-ordered) Gaussian: scatter + cummax ---
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
    span_start = jnp.where(counts_p > 0, offsets_p, max_pairs)
    seed = (
        jnp.zeros((max_pairs,), jnp.int32)
        .at[span_start]
        .max(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    gid = jax.lax.cummax(seed)

    # --- one packed per-pair gather (rows in depth order):
    # [x0, y0, wx, offset, depth-bits, original-gaussian-id] ---
    rect_p = rect[perm]
    pack = jnp.stack(
        [rect_p[:, 0], rect_p[:, 1], wx[perm], offsets_p,
         dq[perm].astype(jnp.int32), perm], axis=1,
    )
    g = pack[gid]                                          # (max_pairs, 6)
    local = pair_idx - g[:, 3]
    valid = pair_idx < total
    # variable int div via exact float reciprocal (+0.5 guards the floor)
    gwf = jnp.maximum(g[:, 2], 1).astype(jnp.float32)
    tyl = jnp.floor((local.astype(jnp.float32) + 0.5) / gwf).astype(jnp.int32)
    txl = local - tyl * g[:, 2]
    tile_id = ((g[:, 1] + tyl) * tiles_x + g[:, 0] + txl).astype(jnp.uint32)
    tile_id = jnp.where(valid, tile_id, jnp.uint32(num_tiles))

    pair_bits = _ceil_log2(max_pairs)  # pair ranks are 0..max_pairs-1
    global FORCE_PAIR_SORT
    # The fast path is only correct when pairs were expanded in global
    # depth order (grouping by tile then preserves within-tile depth order);
    # with PCP_DEPTH_ORDER=0 it must fall through to the keyed sort.
    if tile_bits + pair_bits <= 32 and not FORCE_PAIR_SORT \
            and DEPTH_ORDER_EXPANSION:
        # --- FAST PATH: ONE single-array uint32 sort of [tile | pair-rank].
        # Pairs are expanded in global near-to-far depth order, so a
        # grouping by tile that preserves pair order IS depth-sorted within
        # every tile — no depth bits in the key, and crucially no sort
        # payload: a (key, payload) lax.sort costs ~11x a single-array sort
        # on TPU (46 ms vs 4 ms at 2M pairs). The Gaussian id is recovered
        # with one gather through the unpacked pair rank. ---
        skey = (tile_id << jnp.uint32(pair_bits)) | pair_idx.astype(jnp.uint32)
        s = jax.lax.sort(skey, is_stable=False)
        s_tile = (s >> jnp.uint32(pair_bits)).astype(jnp.int32)
        s_pair = (s & jnp.uint32((1 << pair_bits) - 1)).astype(jnp.int32)
        s_gid = g[:, 5][s_pair]
    else:
        # --- fallback (huge tile grids): [tile | depth-bits] key with the
        # Gaussian id as sort payload (rasterizer_impl.cu:90 semantics) ---
        key = (tile_id << jnp.uint32(depth_bits)) | jnp.where(
            valid, g[:, 4].astype(jnp.uint32), jnp.uint32(0)
        )
        s_key, s_gid = jax.lax.sort((key, g[:, 5]), num_keys=1,
                                    is_stable=False)
        s_tile = (s_key >> jnp.uint32(depth_bits)).astype(jnp.int32)

    # --- per-tile ranges (identifyTileRanges, rasterizer_impl.cu:116-138) ---
    starts, ends = _tile_ranges(s_tile, num_tiles)
    load = ends - starts
    max_tile_load = load.max() if num_tiles > 0 else jnp.int32(0)
    tile_count = jnp.minimum(load, max_per_tile)

    # --- within-tile slot = pair index - segment start; the segment start
    # per PAIR comes from a boundary scatter + cummax (a starts[s_tile]
    # gather over max_pairs scalars benches slower in the full program
    # despite winning the standalone micro-benchmark) ---
    is_boundary = jnp.concatenate(
        [jnp.ones((1,), bool), s_tile[1:] != s_tile[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(is_boundary, pair_idx, 0))
    slot = pair_idx - seg_start
    ok = (s_tile < num_tiles) & (slot < max_per_tile)
    flat_target = jnp.where(
        ok, s_tile * max_per_tile + slot, num_tiles * max_per_tile
    )
    tile_gauss = (
        jnp.full((num_tiles * max_per_tile,), -1, jnp.int32)
        .at[flat_target]
        .set(s_gid, mode="drop")
        .reshape(num_tiles, max_per_tile)
    )
    return TileBins(
        tile_gauss, tile_count, total.astype(jnp.int32),
        max_tile_load.astype(jnp.int32),
        jnp.maximum(total - max_pairs, 0).astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# v2: fixed-slots-per-class expansion (the default).
#
# The v1 pipeline pays three in-context costs the chip profile attributes
# ~22 ms to (tools/exp_expand_bisect.py): a (max_pairs, 6) row gather that
# maps every pair slot to its owning Gaussian's attributes, the scatter+
# cummax that builds that mapping, and a 2M-element scatter into the
# (num_tiles, K) table. v2 removes all three:
#
# - every Gaussian owns a FIXED number of pair slots determined by its
#   footprint class (<=R1 tiles: a row in the dense (N, R1) block;
#   <=R2: a row in a compacted (capB, R2) table; <=R3: (capC, R3)), so the
#   slot -> Gaussian map is a reshape/broadcast, not a gather;
# - per-slot [tile | depth-bits] keys sort with the Gaussian id as payload
#   (rasterizer_impl.cu:90 semantics); invalid slots carry an all-ones
#   sentinel key and sort to the end;
# - the (num_tiles, K) table is a GATHER from the sorted payload through
#   searchsorted tile ranges (identifyTileRanges analog) — gathers scale
#   with num_tiles*K, scatters with the (larger) slot count.
#
# Overflow policy: per-tile loads beyond K keep the NEAREST K (depth is in
# the key). Static-capacity drops (class-B/C/D table full) are counted in
# ``n_dropped`` — the honest-bench contract is n_dropped == 0 and
# max_tile_load <= K. Truncation is structurally impossible: class D rows
# are ``num_tiles`` wide, and no footprint can exceed the tile count.
# ---------------------------------------------------------------------------

# Class geometry, sized against trained-scene footprint statistics
# (tools/bench_scene.py: ~11% of live Gaussians exceed 16 tiles, ~0.7%
# exceed 64, ~1e-5 exceed 512): headroom >= 1.5x at every boundary.
R1 = int(_os.environ.get("PCP_R1", "16"))
R2 = int(_os.environ.get("PCP_R2", "64"))
R3 = int(_os.environ.get("PCP_R3", "512"))
CAPB_DIV = int(_os.environ.get("PCP_CAPB_DIV", "8"))    # capB = N / 8
CAPC_DIV = int(_os.environ.get("PCP_CAPC_DIV", "128"))  # capC = N / 128
CAPD_DIV = int(_os.environ.get("PCP_CAPD_DIV", "4096"))  # capD = N / 4096


def _expand_rows(x0, y0, wx, dq, gid, counts, r, tiles_x, depth_bits):
    """(C,) per-row rect/depth/id data -> (C*r,) sort keys (+ payload).

    Slot j of a row maps to tile (x0 + j % wx, y0 + j // wx) via the exact
    float-reciprocal div (no hardware integer division); slots >= count get
    the sentinel key.

    Layout: all per-slot math runs in (r, C) — the LARGE axis C on the
    128-lane minor dimension, the footprint axis r on sublanes. The
    natural (C, r) orientation puts r (= 16/64) minor and idles 87-50% of
    the VPU datapath for every op in this chain. The flat order is r-major,
    which is irrelevant pre-sort (is_stable=False).

    Payload: the owning Gaussian id; ``gid=None`` skips it (A/B harness
    use). (Two payload-elimination variants were measured and removed:
    a global-slot-id payload for a unique-index backward scatter, and a
    payload-free [tile|depth-rank] single-array sort with post-window id
    recovery — both slower end-to-end; see PERF_NOTES.)"""
    c = x0.shape[0]
    local = jnp.arange(r, dtype=jnp.int32)[:, None]            # (r, 1)
    valid = local < counts[None, :]
    gwf = jnp.maximum(wx, 1).astype(jnp.float32)[None, :]
    tyl = jnp.floor((local.astype(jnp.float32) + 0.5) / gwf).astype(jnp.int32)
    txl = local - tyl * wx[None, :]
    tile = ((y0[None, :] + tyl) * tiles_x + x0[None, :] + txl).astype(
        jnp.uint32)
    key = jnp.where(
        valid,
        (tile << jnp.uint32(depth_bits)) | dq[None, :],
        jnp.uint32(0xFFFFFFFF),
    )
    if gid is None:
        return key.reshape(-1)
    pay = jnp.broadcast_to(gid[None, :], key.shape)
    return key.reshape(-1), pay.reshape(-1)


def autosize_max_per_tile(rects_and_grids, chunk=None, headroom=1.6,
                          floor=128, cap=4096):
    """Pick ``max_per_tile`` from measured per-tile loads (host, one-shot).

    ``rects_and_grids``: iterable of (rect (N, 4) int array from
    ``projection.preprocess``, tiles_x, tiles_y) over sample views.
    Per-view loads come from a 2-D difference array (+1/-1 at the four
    rect corners, two cumsums) — exact per-tile counts in O(N + tiles),
    no expansion. Returns the smallest multiple of ``chunk`` (the
    composite kernel's CH, so no dead chunk slots) >= headroom * the max
    observed load, at least ``floor``; ``cap`` bounds only the HEADROOM
    above the measured load (see ``_cap_fit``) so the table always
    covers the densest observed tile. Headroom covers densify growth;
    the training loop's tile-saturation warning reports if a scene
    outgrows it (loads beyond K keep the nearest K).
    """
    import numpy as np

    if chunk is None:
        from pcp_tpu.ops import pallas_composite as pc

        chunk = pc.CH
    maxload = 0
    for rect, tx, ty in rects_and_grids:
        r = np.asarray(rect)
        r = r[(r[:, 2] > r[:, 0]) & (r[:, 3] > r[:, 1])]
        if r.size == 0:
            continue
        d = np.zeros((ty + 1, tx + 1), np.int64)
        np.add.at(d, (r[:, 1], r[:, 0]), 1)
        np.add.at(d, (r[:, 1], np.minimum(r[:, 2], tx)), -1)
        np.add.at(d, (np.minimum(r[:, 3], ty), r[:, 0]), -1)
        np.add.at(d, (np.minimum(r[:, 3], ty), np.minimum(r[:, 2], tx)), 1)
        load = d.cumsum(0).cumsum(1)[:ty, :tx]
        maxload = max(maxload, int(load.max()))
    k = max(floor, int(-(-headroom * maxload // chunk)) * chunk)
    return int(min(k, _cap_fit(maxload, cap, chunk)))


def expansion_key_slots(n: int, num_tiles: int, active_cap: int = 0,
                        pair_levels=()) -> int:
    """Static key-slot count of _expand_sort_v2's expansion — i.e. the
    sort length the capacity side of binning pays. The training loop's
    re-tuner folds this into its table-cost comparison so a changed
    ``active_cap`` (alive-scaled class tables) or ``pair_levels`` spec
    triggers a recompile the same way changed tile-level geometry does."""
    nb = min(n, active_cap) if 0 < active_cap else n
    if pair_levels:
        cap_d = max(nb // CAPD_DIV, 8)
        pair_levels = tuple(pair_levels)
        if pair_levels and pair_levels[-1][0] == 0:
            cap_d = max(int(pair_levels[-1][1]), 8)
            pair_levels = pair_levels[:-1]
        return (sum(r * c for r, c in pair_levels) + cap_d * num_tiles)
    cap_b = max(nb // CAPB_DIV, 32)
    cap_c = max(nb // CAPC_DIV, 16)
    cap_d = max(nb // CAPD_DIV, 8)
    a_rows = nb if 0 < nb < n else n          # class A compacts iff scaled
    return a_rows * R1 + cap_b * R2 + cap_c * R3 + cap_d * num_tiles


# Footprint-band boundaries for the data-driven pair-expansion ladder:
# per-Gaussian tile footprints in a trained scene are overwhelmingly 1-6
# tiles, so a uniform 16-slot row per alive Gaussian (legacy class A)
# expands ~10x more sort keys than there are pairs at the reference
# operating point. Bands between these bounds get their own row width
# and a measured population cap.
PAIR_BOUNDS = (4, 8, 16, 32, 64, 128, 256, 512)


def footprint_band_counts_device(rect, bounds=PAIR_BOUNDS):
    """Per-band counts of per-Gaussian tile footprints, ON DEVICE
    (jittable): returns (len(bounds) + 1,) int32 — counts in
    (0, b1], (b1, b2], ..., (bm, inf). Culled rows (empty rects) land in
    no band."""
    wx = jnp.maximum(rect[:, 2] - rect[:, 0], 0)
    wy = jnp.maximum(rect[:, 3] - rect[:, 1], 0)
    c = wx * wy
    edges = jnp.asarray((0,) + tuple(bounds), jnp.int32)
    band = jnp.searchsorted(edges, c, side="left")   # 0 = culled
    return jnp.zeros((len(bounds) + 2,), jnp.int32).at[band].add(
        jnp.int32(1))[1:]


def choose_pair_levels(band_counts, bounds=PAIR_BOUNDS, headroom=1.3,
                       drift=0.08, quantum=1024):
    """Pick the pair-expansion ladder ((r_i, cap_i), ...) from measured
    per-view footprint band counts (views, len(bounds)+1; the last column
    is the beyond-last-bound population, which stays in the legacy
    num_tiles-wide safety class).

    Same sizing contract as choose_tile_levels: caps come from DISJOINT
    measured bands, drift between the training loop's re-tunes is covered
    by ``headroom`` on the own-band population plus a ``drift`` fraction
    of the neighbor bands (footprints migrate at most one band per retune
    interval in practice), and an overflow anyway is counted in n_dropped
    which schedules a reactive re-tune. Empty interior bands are elided —
    their range merges into the next wider band.

    A trailing ``(0, cap)`` entry sizes the SAFETY class (the
    num_tiles-wide rows catching footprints beyond the last bound) from
    the MEASURED beyond-bound population instead of the capacity
    heuristic — a scene with more huge splats than nb//CAPD_DIV rows
    would otherwise drop them whole (measured on the small bench scene:
    73 beyond-512 splats vs cap 16, 42k pairs dropped)."""
    import numpy as np

    band_counts = np.asarray(band_counts)
    n_band = band_counts[:, :len(bounds)].max(axis=0)
    beyond = int(band_counts[:, len(bounds)].max())
    levels = []
    for j, r in enumerate(bounds):
        lower = int(n_band[j - 1]) if j > 0 else 0
        upper = int(n_band[j + 1]) if j + 1 < len(bounds) else beyond
        if n_band[j] == 0 and j + 1 < len(bounds):
            continue
        n_at = int(headroom * n_band[j]) + int(drift * (lower + upper))
        cap = max(int(-(-(n_at + 64) // quantum)) * quantum, quantum)
        levels.append((int(r), cap))
    # safety-class cap: measured beyond-bound population + headroom,
    # snapped to a small quantum (these rows are num_tiles wide — keep
    # the table tight but never smaller than the default heuristic's
    # floor of 8)
    cap_s = max(8, int(-(-int(headroom * beyond + 8) // 64)) * 64)
    levels.append((0, cap_s))
    return tuple(levels)


def tile_loads_device(rect, tiles_x, tiles_y):
    """Exact per-tile intersection counts from rects, ON DEVICE (jittable).

    Same 2-D difference-array trick as the host sizers (+1/-1 at the four
    rect corners, two cumsums) but as one scatter-add + cumsums, so
    periodic re-tuning only moves (num_tiles,) ints over the host link
    instead of (N, 4) rect tables (~33 MB/view at 2M capacity through the
    remote-chip tunnel)."""
    valid = (rect[:, 2] > rect[:, 0]) & (rect[:, 3] > rect[:, 1])
    one = jnp.where(valid, 1, 0).astype(jnp.int32)
    x0 = jnp.where(valid, rect[:, 0], 0)
    y0 = jnp.where(valid, rect[:, 1], 0)
    x1 = jnp.where(valid, jnp.minimum(rect[:, 2], tiles_x), 0)
    y1 = jnp.where(valid, jnp.minimum(rect[:, 3], tiles_y), 0)
    w2 = tiles_x + 1
    d = jnp.zeros(((tiles_y + 1) * w2,), jnp.int32)
    d = (d.at[y0 * w2 + x0].add(one)
          .at[y0 * w2 + x1].add(-one)
          .at[y1 * w2 + x0].add(-one)
          .at[y1 * w2 + x1].add(one))
    g = jnp.cumsum(jnp.cumsum(d.reshape(tiles_y + 1, w2), axis=0), axis=1)
    return g[:tiles_y, :tiles_x].reshape(-1)


def _cap_fit(maxload, cap, chunk):
    """Effective k ceiling: ``cap`` bounds HEADROOM, never the measured
    load itself. A k-level smaller than the densest tile's true load
    cannot be re-tuned out of (every re-tune re-measures the same
    saturation, recompiles, and keeps dropping the farthest Gaussians —
    a standing violation of the zero-drop contract and a recompile storm
    observed on the dense fine-detail block of the round-3 scale run:
    max load 7713 vs the old hard cap 4096, one recompile per 100 iters).
    CUDA's analog always grows its buffers to the true need
    (rasterizer_impl.cu:155-194)."""
    return max(cap, int(-(-max(maxload, 1) // chunk)) * chunk)


def choose_tile_classes(loads, num_tiles, chunk=None, headroom=1.6,
                        floor=128, cap=4096):
    """Pick (k_lo, k_hi, t_hi) from measured per-tile loads (views, tiles).

    See autosize_tile_classes for the selection policy."""
    import numpy as np

    from pcp_tpu.ops import pallas_composite as pc

    if chunk is None:
        chunk = pc.CH
    tb = pc.TB
    loads = np.asarray(loads)
    maxload = int(loads.max()) if loads.size else 0
    k_hi = max(floor, int(-(-headroom * max(maxload, 1) // chunk)) * chunk)
    k_hi = int(min(k_hi, _cap_fit(maxload, cap, chunk)))

    best = (num_tiles * k_hi, k_hi, 0)                # single-table cost
    single_cost = best[0]
    for k_lo in range(chunk, k_hi, chunk):
        # worst-case over views of tiles that could outgrow k_lo
        n_over = int((loads > k_lo / headroom).sum(axis=1).max())
        t_hi = int(-(-2 * max(n_over, 1) // tb)) * tb
        if t_hi >= num_tiles // 2:
            continue
        cost = num_tiles * k_lo + t_hi * k_hi
        if cost < best[0]:
            best = (cost, k_lo, t_hi)
    if best[0] > 0.75 * single_cost:
        return k_hi, k_hi, 0
    return best[1], k_hi, best[2]


def choose_tile_levels(loads, num_tiles, chunk=None, headroom=1.6,
                       drift=0.25, floor=128, cap=4096):
    """Pick a multi-level table geometry from measured per-tile loads
    (views, tiles): a dense base at k0 plus compact ~1.5x-step levels up
    to k_top = headroom * max load.

    Every composite-path cost runs ~20 ns per STATIC table slot, so the
    sizing policy IS the step time at scale. Two rules keep total slots
    tracking the true pair count instead of multiples of it:

    * capacities come from DISJOINT load bands (prev, k]. The previous
      both-ways band widening double-booked any load near a boundary
      into two levels — at the reference operating point (4000 tiles,
      loads straddling the 1024 boundary) that was 13M slots for ~3.8M
      pairs. Drift between the training loop's re-tunes is covered by a
      ``drift`` fraction of the NEIGHBOR bands' populations instead (a
      tile can only enter this level from the band just below or just
      above), plus 2*TB absolute slack. A tile that outruns its level's
      capacity anyway falls back to the k0 base truncated and is counted
      in n_dropped, which triggers a reactive re-tune within 100 iters —
      the same converge-by-reacting contract as the CUDA rasterizer's
      buffer resizing (rasterizer_impl.cu:155-194).
    * ~1.5x k steps (chunk-rounded) instead of doubling: worst-case
      intra-level padding drops from 2x to 1.5x. Bands measured empty
      are elided (their neighbors' drift margins still carry slack).

    Returns (k0, ((k_i, t_i), ...)); () levels = single table."""
    import numpy as np

    from pcp_tpu.ops import pallas_composite as pc

    if chunk is None:
        chunk = pc.CH
    tb = pc.TB
    loads = np.asarray(loads)
    maxload = int(loads.max()) if loads.size else 0
    k_top = max(floor, int(-(-headroom * max(maxload, 1) // chunk)) * chunk)
    k_top = int(min(k_top, _cap_fit(maxload, cap, chunk)))
    k0 = 2 * chunk
    if k_top <= 2 * k0:
        return k_top, ()

    ks = []
    k = k0
    while True:
        k = int(-(-(k * 3) // (2 * chunk))) * chunk   # ceil(1.5x) to chunk
        if k >= k_top:
            ks.append(k_top)
            break
        ks.append(k)

    # worst-case-over-views count of tiles in each disjoint band
    bounds = [k0] + ks
    n_band = []
    for j, k in enumerate(ks):
        lo = loads > bounds[j]
        in_band = lo if j == len(ks) - 1 else lo & (loads <= k)
        n_band.append(int(in_band.sum(axis=1).max()))
    # the band just below level 0 feeds rising tiles into it
    n_below = int(((loads > (2 * k0) // 3) & (loads <= k0))
                  .sum(axis=1).max())

    levels = []
    for j, k in enumerate(ks):
        lower = n_band[j - 1] if j > 0 else n_below
        upper = n_band[j + 1] if j + 1 < len(ks) else 0
        if n_band[j] == 0 and j + 1 < len(ks):
            continue                       # elide empty interior bands
        if n_band[j] == 0:
            # the top band exists only as k_top headroom insurance: size
            # it for drift alone (tiles that outrun it saturate k_top and
            # the warning schedules a reactive re-tune anyway)
            n_at = min(int(drift * lower), num_tiles // 16) + 2 * tb
        else:
            n_at = n_band[j] + int(drift * (lower + upper)) + 2 * tb
        t_cap = min(int(-(-n_at // tb)) * tb, num_tiles)
        levels.append((k, t_cap))
    # fold near-dense leading levels into the base: a level holding ~all
    # tiles costs its own (t_cap ~ num_tiles) table PLUS the now-empty
    # dense base PLUS num_tiles extra window extractions — raising k0 to
    # that k is strictly cheaper once t_cap > ~60% of the tiles
    while levels and levels[0][1] > 0.6 * num_tiles:
        k0 = levels[0][0]
        levels = levels[1:]
    return k0, tuple(levels)


def cluster_views(loads, n_classes):
    """Group views into <= ``n_classes`` geometry classes by their
    per-tile load profiles (agglomerative, least union-cost increase).

    WHY: one static table must cover the per-tile MAX over every view it
    serves. Views of a large block look at DIFFERENT parts of it, so the
    all-views union is far fatter than any single view's profile — the
    round-4 quality run paid 9.6M table slots per step against ~2.5M
    true pairs (slot efficiency 0.26) because ~1100 tiles were heavy in
    SOME view. Clustering views with similar profiles and compiling one
    step per class keeps each class's union close to its members' own
    loads — the static-shape answer to CUDA's per-view dynamic sizing
    (rasterizer_impl.cu:155-194), one compile per class instead of per
    view.

    The merge cost is the sum over tiles of the element-wise max of the
    cluster's loads — the pair count a worst-case-union table must
    cover, a monotone proxy for table_slot_cost that keeps the
    agglomeration vectorizable.

    ``loads``: (views, tiles) int array. Returns (labels (views,) int,
    n_found <= n_classes)."""
    import numpy as np

    loads = np.asarray(loads, np.float32)
    v = loads.shape[0]
    if n_classes <= 1:
        return np.zeros(v, np.int64), 1
    if v <= n_classes:
        return np.arange(v, dtype=np.int64), v
    # cluster max-profiles (K, T) and member lists
    maxes = [loads[i] for i in range(v)]
    members = [[i] for i in range(v)]
    while len(maxes) > n_classes:
        m = np.stack(maxes)                       # (K, T)
        cost = m.sum(axis=1)                      # (K,)
        n = np.array([len(x) for x in members], np.float32)
        # minimize EXPECTED per-step cost sum_c (n_c/V) * cost_c: a step
        # pays only its own class's table, so merging i,j changes the
        # objective by (n_i+n_j)*union - n_i*cost_i - n_j*cost_j.
        # pairwise union cost (K, K, T) -> (K, K); K <= 64 so this fits
        union = np.maximum(m[:, None, :], m[None, :, :]).sum(axis=2)
        inc = ((n[:, None] + n[None, :]) * union
               - (n * cost)[:, None] - (n * cost)[None, :])
        np.fill_diagonal(inc, np.inf)
        i, j = np.unravel_index(np.argmin(inc), inc.shape)
        i, j = min(i, j), max(i, j)
        maxes[i] = np.maximum(maxes[i], maxes[j])
        members[i] = members[i] + members[j]
        del maxes[j], members[j]
    labels = np.zeros(v, np.int64)
    for c, mem in enumerate(members):
        labels[mem] = c
    return labels, len(members)


def autosize_tile_classes(rects_and_grids, chunk=None, headroom=1.6,
                          floor=128, cap=4096):
    """Pick the two-level table geometry (k_lo, k_hi, t_hi) from measured
    per-tile loads on sample views (host, one-shot).

    k_hi follows autosize_max_per_tile (headroom over the max observed
    load). k_lo is chosen over CH multiples to minimize the total slot
    count num_tiles*k_lo + t_hi(k_lo)*k_hi, where t_hi(k_lo) is sized so
    every tile whose load exceeds k_lo/headroom (loads drift as densify
    reshapes the scene) fits with 2x margin. Returns t_hi == 0 (single
    table) when the split would not shrink the slot count by >= 25% —
    e.g. near-uniform load distributions."""
    import numpy as np

    from pcp_tpu.ops import pallas_composite as pc

    if chunk is None:
        chunk = pc.CH
    tb = pc.TB
    all_loads = []
    num_tiles = 0
    for rect, tx, ty in rects_and_grids:
        r = np.asarray(rect)
        r = r[(r[:, 2] > r[:, 0]) & (r[:, 3] > r[:, 1])]
        num_tiles = max(num_tiles, tx * ty)
        if r.size == 0:
            continue
        d = np.zeros((ty + 1, tx + 1), np.int64)
        np.add.at(d, (r[:, 1], r[:, 0]), 1)
        np.add.at(d, (r[:, 1], np.minimum(r[:, 2], tx)), -1)
        np.add.at(d, (np.minimum(r[:, 3], ty), r[:, 0]), -1)
        np.add.at(d, (np.minimum(r[:, 3], ty), np.minimum(r[:, 2], tx)), 1)
        all_loads.append(d.cumsum(0).cumsum(1)[:ty, :tx].reshape(-1))
    if not all_loads:
        return floor, floor, 0
    del tb
    return choose_tile_classes(np.stack(all_loads), num_tiles, chunk=chunk,
                               headroom=headroom, floor=floor, cap=cap)


def _tile_ranges(s_tile, num_tiles):
    """Per-tile [start, end) ranges in a SORTED tile-id array
    (identifyTileRanges analog, rasterizer_impl.cu:116-138).

    s_tile is non-decreasing, so end(t) == first index with id > t ==
    start(t+1): ONE searchsorted over num_tiles+1 queries covers both
    (each query is ~22 sequential binary-search gather rounds on TPU —
    halving the query set halves the table-range cost)."""
    bounds = jnp.searchsorted(
        s_tile, jnp.arange(num_tiles + 1, dtype=s_tile.dtype), side="left"
    ).astype(jnp.int32)
    return bounds[:num_tiles], bounds[1:]


def _compact_classes(masks_caps, n):
    """Stream-compact several disjoint masks into their (cap,) tables
    with ONE scatter (-1 pads; rows past a cap are dropped, counted by
    the caller via the returned ranks).

    Three separate scatters measured ~0.6 ms EACH on TPU regardless of
    table size (per-scatter fixed cost dominates at these shapes); the
    fused form pays it once."""
    src = jnp.arange(n, dtype=jnp.int32)
    total = sum(cap for _, cap in masks_caps)
    tgt = jnp.full((n,), total, jnp.int32)
    ranks = []
    off = 0
    for mask, cap in masks_caps:
        rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
        ranks.append(rank)
        tgt = jnp.where(mask & (rank < cap), off + rank, tgt)
        off += cap
    idx_all = jnp.full((total,), -1, jnp.int32).at[tgt].set(src, mode="drop")
    out = []
    off = 0
    for (mask, cap), rank in zip(masks_caps, ranks):
        out.append((idx_all[off:off + cap], rank))
        off += cap
    return out


def _expand_sort_v2(rect, depths, tiles_x, tiles_y, active_cap=0,
                    pair_levels=()):
    """The v2 class-table expansion + [tile|depth] sort, shared by the
    single-table and multi-level window builders.

    ``active_cap`` (static): expected upper bound on LIVE Gaussians —
    class-table caps scale from it instead of the full slot capacity.
    At reference scale (capacity 2^21, ~720k alive) the capacity-scaled
    tables expand+sort 60.7M key slots of which most are dead-slot
    sentinels; an alive-scaled bound roughly halves that. The training
    loop re-tunes it with the tile-level geometry (drops are counted if
    the population outgrows it between re-tunes). 0 = full capacity.

    ``pair_levels`` ((r_i, cap_i), ... from choose_pair_levels): replaces
    the static class geometry with measured footprint bands — band i
    holds Gaussians with footprint in (r_{i-1}, r_i] in a (cap_i, r_i)
    compact table. The legacy uniform-16-slots class A expands ~10x more
    sort keys than true pairs at the reference operating point; measured
    bands track the footprint distribution instead. A num_tiles-wide
    safety class always catches footprints beyond the last bound.

    Returns (s_pay sorted Gaussian ids, starts, load, total, drops)."""
    n = rect.shape[0]
    num_tiles = tiles_x * tiles_y
    tile_bits = _ceil_log2(num_tiles + 1)
    depth_bits = 32 - tile_bits
    assert tile_bits <= 16, f"{num_tiles} tiles won't fit the packed key"
    nb = min(n, active_cap) if active_cap > 0 else n
    cap_d = max(nb // CAPD_DIV, 8)

    x0, y0 = rect[:, 0], rect[:, 1]
    wx = rect[:, 2] - rect[:, 0]
    wy = rect[:, 3] - rect[:, 1]
    counts = (wx * wy).astype(jnp.int32)
    total = jnp.sum(counts)
    dq = (
        jax.lax.bitcast_convert_type(depths.astype(jnp.float32), jnp.uint32)
        >> jnp.uint32(32 - depth_bits)
    )

    gid_all = jnp.arange(n, dtype=jnp.int32)

    key_a = pay_a = None
    if pair_levels:
        # a trailing (0, cap) entry overrides the safety-class cap with
        # the measured beyond-bound population (choose_pair_levels)
        pair_levels = tuple(pair_levels)
        if pair_levels and pair_levels[-1][0] == 0:
            cap_d = max(int(pair_levels[-1][1]), 8)
            pair_levels = pair_levels[:-1]
    if pair_levels:
        rs = [r for r, _ in pair_levels]
        assert rs == sorted(rs) and rs[0] > 0
        class_specs = []
        prev = 0
        for r, cap in pair_levels:
            class_specs.append(
                ((counts > prev) & (counts <= r), int(cap), int(r)))
            prev = r
        class_specs.append((counts > prev, cap_d, num_tiles))
    else:
        cap_b = max(nb // CAPB_DIV, 32)
        cap_c = max(nb // CAPC_DIV, 16)
        class_specs = [((counts > R1) & (counts <= R2), cap_b, R2),
                       ((counts > R2) & (counts <= R3), cap_c, R3),
                       # class D: footprints beyond R3 get rows as wide as
                       # the whole tile grid (a footprint cannot exceed
                       # num_tiles), so nothing is ever truncated; the
                       # table is tiny because such splats are vanishingly
                       # rare in any scene that survives densify/prune.
                       (counts > R3, cap_d, num_tiles)]
        if 0 < nb < n:
            # alive-scaled mode: class A compacts too (dead slots emit no
            # sentinel rows; counts==0 rows never enter any table)
            class_specs.insert(
                0, ((counts > 0) & (counts <= R1), nb, R1))
        else:
            # class A: dense rows, footprint <= R1 (zero-risk default)
            counts_a = jnp.where(counts <= R1, counts, 0)
            key_a, pay_a = _expand_rows(x0, y0, wx, dq, gid_all, counts_a,
                                        R1, tiles_x, depth_bits)

    compacted = _compact_classes(
        [(m, cap) for m, cap, _ in class_specs], n)

    # ONE (5, 1)-column gather per class table instead of five 1-D gathers
    # (x0/y0/wx/dq/counts at the same src): the TPU gather unit costs
    # ~20-30 ns PER INDEX roughly independent of the slice width, so five
    # separate gathers over the biggest band (~680k members at reference
    # scale) ran ~60 ms/step where the packed column gather runs one
    # index stream (PERF_NOTES round 4).
    geo_planes = jnp.stack([
        x0, y0, wx, jax.lax.bitcast_convert_type(dq, jnp.int32), counts,
    ])                                                     # (5, N)

    def table(which, mask, cap, r):
        idx, rank_c = compacted[which]
        ok = idx >= 0
        src = jnp.maximum(idx, 0)
        g = jax.vmap(lambda v: v[src])(geo_planes)         # (5, C)
        cnt_src = g[4]
        cnt = jnp.where(ok, jnp.minimum(cnt_src, r), 0)
        key, pay = _expand_rows(
            g[0], g[1], g[2],
            jax.lax.bitcast_convert_type(g[3], jnp.uint32), src, cnt, r,
            tiles_x, depth_bits,
        )
        # drops: whole Gaussians past the table cap + per-row truncation
        over = jnp.sum(jnp.where(mask & (rank_c >= cap), counts, 0))
        trunc = jnp.sum(jnp.where(ok, cnt_src - cnt, 0))
        return key, pay, over + trunc

    keys_l, pays_l, drops = [], [], jnp.int32(0)
    for which, (mask, cap, r) in enumerate(class_specs):
        k_w, p_w, d_w = table(which, mask, cap, r)
        keys_l.append(k_w)
        pays_l.append(p_w)
        drops = drops + d_w
    if key_a is not None:
        keys_l.insert(0, key_a)
        pays_l.insert(0, pay_a)

    keys = jnp.concatenate(keys_l)
    pays = jnp.concatenate(pays_l)
    s_key, s_pay = jax.lax.sort((keys, pays), num_keys=1, is_stable=False)
    s_tile = (s_key >> jnp.uint32(depth_bits)).astype(jnp.int32)

    starts, ends = _tile_ranges(s_tile, num_tiles)
    load = ends - starts
    return s_pay, starts, load, total, drops


def bin_gaussians_v2(
    rect: jnp.ndarray,
    depths: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    max_per_tile: int,
    active_cap: int = 0,
    pair_levels=(),
) -> TileBins:
    num_tiles = tiles_x * tiles_y
    s_pay, starts, load, total, dropped = _expand_sort_v2(
        rect, depths, tiles_x, tiles_y, active_cap, pair_levels)
    max_tile_load = load.max() if num_tiles > 0 else jnp.int32(0)
    tile_count = jnp.minimum(load, max_per_tile)

    k_idx = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    live = k_idx < tile_count[:, None]
    # Window extraction: each tile's K entries are a CONTIGUOUS range
    # [starts[t], starts[t]+K) of the sorted payload — K sentinel rows of
    # padding make every slice in-bounds, so this lowers to num_tiles
    # contiguous K-row copies (DMA-friendly) instead of nt*K scalar
    # gathers.
    s_pay_pad = jnp.concatenate(
        [s_pay, jnp.full((max_per_tile,), -1, s_pay.dtype)])
    if WINDOW_MODE == "gather":
        pos = starts[:, None] + k_idx
        pay_tbl = s_pay_pad[jnp.minimum(pos, s_pay_pad.shape[0] - 1)]
    else:
        pay_tbl = jax.vmap(
            lambda s: jax.lax.dynamic_slice(s_pay_pad, (s,), (max_per_tile,))
        )(starts)
    tile_gauss = jnp.where(live, pay_tbl, -1)

    return TileBins(
        tile_gauss,
        tile_count,
        total.astype(jnp.int32),
        max_tile_load.astype(jnp.int32),
        dropped.astype(jnp.int32),
    )


class TileBinsSplit(NamedTuple):
    """Two-level per-tile Gaussian tables (the load-skew answer).

    A single (num_tiles, K) table must size K for the DENSEST tile, and
    every composite-path cost (attribute gather, kernel DMA, gradient
    table, segment-sum) scales with num_tiles*K even though compute skips
    dead slots — at the reference operating point (1280x800, K=3712 vs
    mean load ~800) that was 1.19 s of a 1.48 s step. Here most tiles
    live in a (num_tiles, k_lo) table and the few heavy tiles' FULL lists
    live in a compact (t_hi, k_hi) table addressed by ``hi_ids`` — total
    slots track the load distribution, not its max. The CUDA reference
    needs no analog: its per-tile ranges are naturally variable-length
    (rasterizer_impl.cu:116-138); this is the static-shape equivalent.
    """
    tile_gauss: jnp.ndarray   # (num_tiles, k_lo) int32 ids; -1 pad
    hi_ids: jnp.ndarray       # (t_hi,) int32 tile ids of hi-class rows; -1 pad
    hi_gauss: jnp.ndarray     # (t_hi, k_hi) int32 ids; -1 pad
    tile_count: jnp.ndarray   # (num_tiles,) live entries (pre-split loads)
    n_pairs: jnp.ndarray      # () int32 total intersections
    max_tile_load: jnp.ndarray  # () int32 max pre-clamp per-tile occupancy
    n_dropped: jnp.ndarray    # () int32 pairs lost to static caps
    n_hi: jnp.ndarray         # () int32 tiles whose load exceeded k_lo


class TileBinsLevels(NamedTuple):
    """N-level per-tile tables: a dense (num_tiles, k0) base plus compact
    (t_i, k_i) tables at doubling k_i, each addressed by explicit tile ids.

    Real blocks show BROAD load distributions (the reference operating
    point at init: p50 960 / p99 2119 / max 2637 over 4000 tiles), so a
    two-level split saves little — padding every tile to its next level
    bounds total slots by ~1.5x the true pair count regardless of shape.
    Tiles overflowing their level's capacity fall back to the dense base
    truncated to k0 (nearest-k, counted in n_dropped)."""
    base: jnp.ndarray         # (num_tiles, k0) int32 ids; -1 pad
    ids: tuple                # per level: (t_i,) int32 tile ids; -1 pad
    tables: tuple             # per level: (t_i, k_i) int32 ids; -1 pad
    tile_count: jnp.ndarray   # (num_tiles,) live entries (post-policy)
    n_pairs: jnp.ndarray      # () int32 total intersections
    max_tile_load: jnp.ndarray  # () int32 max pre-clamp per-tile occupancy
    n_dropped: jnp.ndarray    # () int32 pairs lost to static caps


def bin_gaussians_levels(
    rect: jnp.ndarray,
    depths: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    k0: int,
    levels,                   # sequence of (k_i, t_i), k_i strictly rising
    active_cap: int = 0,
    pair_levels=(),
) -> TileBinsLevels:
    """N-level binning (see TileBinsLevels). All windows cut from ONE
    expand+sort; a tile lives in the smallest level whose k covers its
    load (level capacities permitting)."""
    num_tiles = tiles_x * tiles_y
    s_pay, starts, load, total, dropped = _expand_sort_v2(
        rect, depths, tiles_x, tiles_y, active_cap, pair_levels)
    max_tile_load = load.max() if num_tiles > 0 else jnp.int32(0)
    ks = [k for k, _ in levels]
    assert list(ks) == sorted(ks) and (not ks or ks[0] > k0)
    k_max = ks[-1] if ks else k0

    s_pay_pad = jnp.concatenate(
        [s_pay, jnp.full((k_max,), -1, s_pay.dtype)])
    tile_ids_all = jnp.arange(num_tiles, dtype=jnp.int32)

    def window(starts_w, counts_w, k):
        idx = jnp.arange(k, dtype=jnp.int32)[None, :]
        if WINDOW_MODE == "gather":
            pos = starts_w[:, None] + idx
            tbl = s_pay_pad[jnp.minimum(pos, s_pay_pad.shape[0] - 1)]
        else:
            tbl = jax.vmap(
                lambda s: jax.lax.dynamic_slice(s_pay_pad, (s,), (k,))
            )(starts_w)
        return jnp.where(idx < counts_w[:, None], tbl, -1)

    # level of each tile: smallest k_i >= load (0 = dense base)
    lvl = jnp.zeros((num_tiles,), jnp.int32)
    for i, k in enumerate(ks):
        lvl = jnp.where(load > (k0 if i == 0 else ks[i - 1]), i + 1, lvl)
    lvl = jnp.where(load > k_max, len(ks), lvl)   # beyond k_max: top level

    ids_out, tables_out = [], []
    placed_any = jnp.zeros((num_tiles,), bool)
    trunc_unplaced = jnp.int32(0)
    for i, (k, t_cap) in enumerate(levels):
        mask = lvl == i + 1
        rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
        placed = mask & (rank < t_cap)
        ids_i = (
            jnp.full((t_cap,), -1, jnp.int32)
            .at[jnp.where(placed, rank, t_cap)]
            .set(tile_ids_all, mode="drop")
        )
        src = jnp.maximum(ids_i, 0)
        starts_i = jnp.where(ids_i >= 0, starts[src], s_pay.shape[0])
        cnt_i = jnp.where(ids_i >= 0, jnp.minimum(load[src], k), 0)
        tables_out.append(window(starts_i, cnt_i, k))
        ids_out.append(ids_i)
        placed_any = placed_any | placed
        # capacity overflow: those tiles fall back to the base at k0
        trunc_unplaced += jnp.sum(
            jnp.where(mask & ~placed, load - jnp.minimum(load, k0), 0))

    in_base = (lvl == 0) | ~placed_any
    base_cnt = jnp.where(in_base, jnp.minimum(load, k0), 0)
    base = window(starts, base_cnt, k0)

    # effective per-tile slot budget: its level's k (k0 for base/fallback)
    eff_k = jnp.full((num_tiles,), k0, jnp.int32)
    for (k, _), ids_i in zip(levels, ids_out):
        eff_k = eff_k.at[jnp.maximum(ids_i, 0)].max(
            jnp.where(ids_i >= 0, k, 0), mode="drop")

    return TileBinsLevels(
        base,
        tuple(ids_out),
        tuple(tables_out),
        jnp.minimum(load, eff_k),
        total.astype(jnp.int32),
        max_tile_load.astype(jnp.int32),
        (dropped + trunc_unplaced).astype(jnp.int32),
    )


def bin_gaussians_split(
    rect: jnp.ndarray,
    depths: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    k_lo: int,
    k_hi: int,
    t_hi: int,
) -> TileBinsSplit:
    """Two-level binning — the N=1 case of bin_gaussians_levels, kept as
    the explicit-flag (--tile_k_lo/--tile_hi_cap) surface."""
    b = bin_gaussians_levels(rect, depths, tiles_x, tiles_y, k_lo,
                             [(k_hi, t_hi)])
    n_hi = jnp.sum((b.ids[0] >= 0).astype(jnp.int32))
    return TileBinsSplit(
        b.base, b.ids[0], b.tables[0], b.tile_count, b.n_pairs,
        b.max_tile_load, b.n_dropped, n_hi,
    )
