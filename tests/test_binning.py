"""Tile binning: depth ordering, overflow policy, saturation signal.

Covers the TPU rebuild of the reference's CUB binning pipeline
(rasterizer_impl.cu:70-138): pair expansion, [tile|depth] key sort, tile
ranges — plus the static-shape overflow policies the CUDA version did not
need (it resized buffers dynamically, rasterize_points.cu:27-33).
"""

import jax.numpy as jnp
import numpy as np

from pcp_tpu.ops.binning import bin_gaussians

TX, TY = 4, 4


def _bins(rect, depths, max_pairs=256, max_per_tile=8):
    return bin_gaussians(
        jnp.asarray(rect, jnp.int32), jnp.asarray(depths, jnp.float32),
        TX, TY, max_pairs=max_pairs, max_per_tile=max_per_tile,
    )


def test_within_tile_depth_order():
    # three gaussians on the same tile, shuffled depths
    rect = [[1, 1, 2, 2]] * 3
    depths = [5.0, 1.0, 3.0]
    b = _bins(rect, depths)
    tile = 1 * TX + 1
    ids = np.asarray(b.tile_gauss[tile])[: int(b.tile_count[tile])]
    assert list(ids) == [1, 2, 0]  # nearest first


def test_pair_overflow_drops_farthest():
    # 8 single-tile gaussians but room for only 5 pairs: the 5 NEAREST
    # must survive, regardless of index order.
    n = 8
    rng = np.random.default_rng(0)
    depths = rng.permutation(np.arange(1, n + 1)).astype(np.float32)
    rect = [[i % TX, i // TX, i % TX + 1, i // TX + 1] for i in range(n)]
    b = _bins(rect, depths, max_pairs=5)
    assert int(b.n_pairs) == n  # pre-cap count reports the true total
    kept = set()
    for t in range(TX * TY):
        kept |= set(np.asarray(b.tile_gauss[t])[: int(b.tile_count[t])].tolist())
    want = set(np.argsort(depths)[:5].tolist())
    assert kept == want


def test_per_tile_saturation_keeps_nearest_and_reports_load():
    n = 6
    rect = [[0, 0, 1, 1]] * n
    depths = np.asarray([6.0, 2.0, 4.0, 1.0, 5.0, 3.0])
    b = _bins(rect, depths, max_per_tile=3)
    assert int(b.max_tile_load) == n  # pre-clamp occupancy surfaced
    ids = np.asarray(b.tile_gauss[0])[: int(b.tile_count[0])]
    assert list(ids) == [3, 1, 5]  # three nearest, ordered near-to-far


def test_multi_tile_spans():
    # one gaussian covering a 2x2 tile rect lands in all four tiles
    b = _bins([[1, 1, 3, 3]], [2.0])
    hit = {
        t for t in range(TX * TY) if int(b.tile_count[t]) > 0
    }
    assert hit == {1 * TX + 1, 1 * TX + 2, 2 * TX + 1, 2 * TX + 2}
    assert int(b.n_pairs) == 4
    assert int(b.max_tile_load) == 1
