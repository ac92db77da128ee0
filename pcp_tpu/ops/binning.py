"""Tile binning: Gaussian x tile intersection keys -> per-tile depth-sorted
Gaussian lists, with static shapes.

Replaces the reference's dynamic CUB pipeline (rasterizer_impl.cu:70-138:
InclusiveSum over tiles_touched -> duplicateWithKeys -> DeviceRadixSort on
[tileID|depth] 64-bit keys -> identifyTileRanges) with XLA-friendly ops:

- pair expansion is a `searchsorted` over the exclusive-prefix-sum of
  per-Gaussian tile counts (no per-Gaussian loop, no dynamic allocation;
  a static ``max_pairs`` capacity bounds the duplication — the CUDA version
  resizes buffers dynamically, rasterize_points.cu:27-33);
- the 64-bit radix sort becomes: (1) one small argsort of the N Gaussians by
  depth, then (2) ONE single-key int32 sort of the pairs on the packed key
  ``tile_id << ceil_log2(N) | depth_rank`` — exact [tile | depth]
  lexicographic order in 32 bits. TPUs have no 64-bit sort and multi-key
  sorts cost ~2x; depth *ranks* compress the depth key from 32 bits to
  log2(N) bits losslessly. Falls back to a two-key sort when
  log2(tiles) + log2(N) > 31 (e.g. >8k tiles with >256k Gaussians).
- tile ranges become a scatter of within-tile ranks into a fixed
  (num_tiles, max_per_tile) index matrix, so the render stage can gather
  fixed-shape blocks.

Overflow policy: pairs beyond ``max_pairs`` are dropped from the tail of the
expansion; per-tile lists keep the *nearest* ``max_per_tile`` Gaussians
(keys sort by depth within a tile). Callers detect overflow via ``n_pairs``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    tile_gauss: jnp.ndarray   # (num_tiles, max_per_tile) int32 gauss ids; -1 pad
    tile_count: jnp.ndarray   # (num_tiles,) int32 live entries per tile
    n_pairs: jnp.ndarray      # () int32 total intersections (pre-cap)


def _ceil_log2(x: int) -> int:
    return max(1, (x - 1).bit_length())


def bin_gaussians(
    rect: jnp.ndarray,      # (N, 4) int32 tile bounds [x0,y0,x1,y1)
    depths: jnp.ndarray,    # (N,) camera-space depths
    tiles_x: int,
    tiles_y: int,
    max_pairs: int,
    max_per_tile: int,
) -> TileBins:
    n = rect.shape[0]
    num_tiles = tiles_x * tiles_y
    wx = rect[:, 2] - rect[:, 0]
    wy = rect[:, 3] - rect[:, 1]
    counts = (wx * wy).astype(jnp.int32)                    # tiles touched
    offsets = jnp.cumsum(counts) - counts                   # exclusive prefix
    total = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)

    # --- depth ranks: one small N-sort replaces depth bits in the pair key
    # (culled Gaussians produce no pairs, their rank value is irrelevant) ---
    rank_bits = _ceil_log2(n)
    tile_bits = _ceil_log2(num_tiles + 1)
    order = jnp.argsort(depths)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )

    # --- pair expansion (duplicateWithKeys, rasterizer_impl.cu:70-93) ---
    # Owner of pair slot p = the Gaussian whose [offset, offset+count) span
    # covers p. A searchsorted here costs ~0.5 s on TPU (17 sequential
    # binary-search gather steps over max_pairs queries); instead scatter
    # each Gaussian's index at its span start and take a running max —
    # one scatter + one associative cummax scan.
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
    span_start = jnp.where(counts > 0, offsets, max_pairs)
    seed = (
        jnp.zeros((max_pairs,), jnp.int32)
        .at[span_start]
        .max(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    gid = jax.lax.cummax(seed)
    local = pair_idx - offsets[gid]
    valid = pair_idx < total
    gw = jnp.maximum(wx[gid], 1)
    tx = rect[gid, 0] + local % gw
    ty = rect[gid, 1] + local // gw
    tile_id = (ty * tiles_x + tx).astype(jnp.int32)
    tile_id = jnp.where(valid, tile_id, num_tiles)          # invalid -> end

    if rank_bits + tile_bits <= 31:
        # --- packed single-key sort: [tile | depth-rank] in one int32 ---
        key = (tile_id << rank_bits) | jnp.where(valid, rank[gid], 0)
        s_key, s_gid = jax.lax.sort((key, gid), num_keys=1, is_stable=False)
        s_tile = s_key >> rank_bits
    else:
        # --- fallback: two-key lexicographic sort (tile, depth) ---
        depth_key = jnp.where(valid, depths[gid], jnp.inf).astype(jnp.float32)
        s_tile, _, s_gid = jax.lax.sort(
            (tile_id, depth_key, gid), num_keys=2, is_stable=False
        )

    # --- per-tile ranges (identifyTileRanges, rasterizer_impl.cu:116-138) ---
    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(s_tile, tile_range, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(s_tile, tile_range, side="right").astype(jnp.int32)
    tile_count = jnp.minimum(ends - starts, max_per_tile)

    # --- scatter within-tile ranks into the fixed gather matrix ---
    slot = jnp.arange(max_pairs, dtype=jnp.int32) - starts[
        jnp.clip(s_tile, 0, num_tiles - 1)
    ]
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
    return TileBins(tile_gauss, tile_count, total.astype(jnp.int32))
