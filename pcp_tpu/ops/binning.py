"""Tile binning: Gaussian x tile intersection keys -> per-tile depth-sorted
Gaussian lists, with static shapes.

Replaces the reference's dynamic CUB pipeline (rasterizer_impl.cu:70-138:
InclusiveSum over tiles_touched -> duplicateWithKeys -> DeviceRadixSort on
[tileID|depth] 64-bit keys -> identifyTileRanges) with XLA-friendly ops:

- pair expansion is a `searchsorted` over the exclusive-prefix-sum of
  per-Gaussian tile counts (no per-Gaussian loop, no dynamic allocation;
  a static ``max_pairs`` capacity bounds the duplication — the CUDA version
  resizes buffers dynamically, rasterize_points.cu:27-33);
- the 64-bit radix sort becomes one `jax.lax.sort` with two keys
  (tile id, depth) — TPUs have no native 64-bit ints, two-key lexicographic
  sort is the idiomatic equivalent;
- tile ranges become a scatter of within-tile ranks into a fixed
  (num_tiles, max_per_tile) index matrix, so the render stage can gather
  fixed-shape blocks.

Overflow policy: pairs beyond ``max_pairs`` are dropped from the tail of the
expansion (Gaussians are in arbitrary order, so this is a global random drop);
per-tile lists keep the *nearest* ``max_per_tile`` Gaussians (sort is by
depth), which matches what front-to-back compositing would mostly keep anyway.
Callers can detect overflow via the returned ``n_pairs``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    tile_gauss: jnp.ndarray   # (num_tiles, max_per_tile) int32 gauss ids; -1 pad
    tile_count: jnp.ndarray   # (num_tiles,) int32 live entries per tile
    n_pairs: jnp.ndarray      # () int32 total intersections (pre-cap)


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

    # --- pair expansion (duplicateWithKeys, rasterizer_impl.cu:70-93) ---
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
    # gauss owning pair p: last g with offsets[g] <= p
    gid = jnp.searchsorted(offsets, pair_idx, side="right").astype(jnp.int32) - 1
    gid = jnp.clip(gid, 0, n - 1)
    local = pair_idx - offsets[gid]
    valid = (pair_idx < total) & (local >= 0) & (local < counts[gid])
    gw = jnp.maximum(wx[gid], 1)
    tx = rect[gid, 0] + local % gw
    ty = rect[gid, 1] + local // gw
    tile_id = (ty * tiles_x + tx).astype(jnp.int32)
    tile_id = jnp.where(valid, tile_id, num_tiles)          # invalid -> end

    # --- two-key lexicographic sort = 64-bit [tile|depth] radix sort ---
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
    rank = jnp.arange(max_pairs, dtype=jnp.int32) - starts[
        jnp.clip(s_tile, 0, num_tiles - 1)
    ]
    ok = (s_tile < num_tiles) & (rank < max_per_tile)
    flat_target = jnp.where(
        ok, s_tile * max_per_tile + rank, num_tiles * max_per_tile
    )
    tile_gauss = (
        jnp.full((num_tiles * max_per_tile,), -1, jnp.int32)
        .at[flat_target]
        .set(s_gid, mode="drop")
        .reshape(num_tiles, max_per_tile)
    )
    return TileBins(tile_gauss, tile_count, total.astype(jnp.int32))
