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
) -> TileBins:
    if BINNING_VERSION == "v2":
        return bin_gaussians_v2(rect, depths, tiles_x, tiles_y, max_per_tile)
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
    observed load, clamped to [floor, cap]. Headroom covers densify
    growth; the training loop's tile-saturation warning reports if a
    scene outgrows it (loads beyond K keep the nearest K).
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
    return int(min(k, cap))


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
    loads = np.stack(all_loads)                       # (views, tiles)
    maxload = int(loads.max())
    k_hi = max(floor, int(-(-headroom * maxload // chunk)) * chunk)
    k_hi = int(min(k_hi, cap))

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


def _expand_sort_v2(rect, depths, tiles_x, tiles_y):
    """The v2 class-table expansion + [tile|depth] sort, shared by the
    single-table and two-level (split) window builders.

    Returns (s_pay sorted Gaussian ids, starts, load, total, drops)."""
    n = rect.shape[0]
    num_tiles = tiles_x * tiles_y
    tile_bits = _ceil_log2(num_tiles + 1)
    depth_bits = 32 - tile_bits
    assert tile_bits <= 16, f"{num_tiles} tiles won't fit the packed key"
    cap_b = max(n // CAPB_DIV, 32)
    cap_c = max(n // CAPC_DIV, 16)

    cap_d = max(n // CAPD_DIV, 8)

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

    # class A: dense rows, footprint <= R1
    counts_a = jnp.where(counts <= R1, counts, 0)
    key_a, pay_a = _expand_rows(x0, y0, wx, dq, gid_all, counts_a, R1,
                                tiles_x, depth_bits)

    compacted = _compact_classes(
        [((counts > R1) & (counts <= R2), cap_b),
         ((counts > R2) & (counts <= R3), cap_c),
         (counts > R3, cap_d)],
        n,
    )

    def table(which, mask, cap, r):
        idx, rank_c = compacted[which]
        ok = idx >= 0
        src = jnp.maximum(idx, 0)
        cnt = jnp.where(ok, jnp.minimum(counts[src], r), 0)
        key, pay = _expand_rows(
            x0[src], y0[src], wx[src], dq[src], src, cnt, r,
            tiles_x, depth_bits,
        )
        # drops: whole Gaussians past the table cap + per-row truncation
        over = jnp.sum(jnp.where(mask & (rank_c >= cap), counts, 0))
        trunc = jnp.sum(jnp.where(ok, counts[src] - cnt, 0))
        return key, pay, over + trunc

    key_b, pay_b, drop_b = table(0, (counts > R1) & (counts <= R2), cap_b, R2)
    key_c, pay_c, drop_c = table(1, (counts > R2) & (counts <= R3), cap_c, R3)
    # class D: footprints beyond R3 get rows as wide as the whole tile grid
    # (a footprint cannot exceed num_tiles), so nothing is ever truncated;
    # the table is tiny (N/4096 rows) because such splats are vanishingly
    # rare in any scene that survives densify/prune.
    key_d, pay_d, drop_d = table(2, counts > R3, cap_d, num_tiles)

    keys = jnp.concatenate([key_a, key_b, key_c, key_d])
    pays = jnp.concatenate([pay_a, pay_b, pay_c, pay_d])
    s_key, s_pay = jax.lax.sort((keys, pays), num_keys=1, is_stable=False)
    s_tile = (s_key >> jnp.uint32(depth_bits)).astype(jnp.int32)

    starts, ends = _tile_ranges(s_tile, num_tiles)
    load = ends - starts
    return s_pay, starts, load, total, drop_b + drop_c + drop_d


def bin_gaussians_v2(
    rect: jnp.ndarray,
    depths: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    max_per_tile: int,
) -> TileBins:
    num_tiles = tiles_x * tiles_y
    s_pay, starts, load, total, dropped = _expand_sort_v2(
        rect, depths, tiles_x, tiles_y)
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


def bin_gaussians_split(
    rect: jnp.ndarray,
    depths: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    k_lo: int,
    k_hi: int,
    t_hi: int,
) -> TileBinsSplit:
    """Two-level binning: tiles with load <= k_lo fill the dense lo table;
    heavier tiles move WHOLLY (up to k_hi, nearest-k policy beyond) into
    the compact hi table. Hi-class tiles beyond the ``t_hi`` capacity stay
    in the lo table truncated to its k_lo (nearest-k), counted in
    ``n_dropped`` — degradation, never corruption."""
    num_tiles = tiles_x * tiles_y
    s_pay, starts, load, total, dropped = _expand_sort_v2(
        rect, depths, tiles_x, tiles_y)
    max_tile_load = load.max() if num_tiles > 0 else jnp.int32(0)

    is_hi = load > k_lo
    rank = jnp.cumsum(is_hi.astype(jnp.int32)) - 1
    placed = is_hi & (rank < t_hi)
    n_hi = jnp.sum(is_hi.astype(jnp.int32))
    hi_ids = (
        jnp.full((t_hi,), -1, jnp.int32)
        .at[jnp.where(placed, rank, t_hi)]
        .set(jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")
    )

    # k_hi sentinel rows keep every window slice in-bounds (and give pad
    # hi rows, whose start points at the sentinel zone, all -1s)
    s_pay_pad = jnp.concatenate(
        [s_pay, jnp.full((max(k_hi, k_lo),), -1, s_pay.dtype)])

    k_idx = jnp.arange(k_lo, dtype=jnp.int32)[None, :]
    lo_cnt = jnp.where(placed, 0, jnp.minimum(load, k_lo))
    if WINDOW_MODE == "gather":
        pos = starts[:, None] + k_idx
        lo_tbl = s_pay_pad[jnp.minimum(pos, s_pay_pad.shape[0] - 1)]
    else:
        lo_tbl = jax.vmap(
            lambda s: jax.lax.dynamic_slice(s_pay_pad, (s,), (k_lo,))
        )(starts)
    tile_gauss = jnp.where(k_idx < lo_cnt[:, None], lo_tbl, -1)

    starts_hi = jnp.where(hi_ids >= 0, starts[jnp.maximum(hi_ids, 0)],
                          s_pay.shape[0])
    hi_cnt = jnp.where(hi_ids >= 0,
                       jnp.minimum(load[jnp.maximum(hi_ids, 0)], k_hi), 0)
    kh_idx = jnp.arange(k_hi, dtype=jnp.int32)[None, :]
    if WINDOW_MODE == "gather":
        pos_h = starts_hi[:, None] + kh_idx
        hi_tbl = s_pay_pad[jnp.minimum(pos_h, s_pay_pad.shape[0] - 1)]
    else:
        hi_tbl = jax.vmap(
            lambda s: jax.lax.dynamic_slice(s_pay_pad, (s,), (k_hi,))
        )(starts_hi)
    hi_gauss = jnp.where(kh_idx < hi_cnt[:, None], hi_tbl, -1)

    # unplaced hi tiles fall back to the lo table at k_lo: count the tail
    trunc_unplaced = jnp.sum(
        jnp.where(is_hi & ~placed, load - k_lo, 0))

    return TileBinsSplit(
        tile_gauss,
        hi_ids,
        hi_gauss,
        jnp.minimum(load, jnp.where(is_hi, k_hi, k_lo)),
        total.astype(jnp.int32),
        max_tile_load.astype(jnp.int32),
        (dropped + trunc_unplaced).astype(jnp.int32),
        n_hi,
    )
