"""Tile binning: depth ordering, overflow policy, saturation signal.

Covers the TPU rebuild of the reference's CUB binning pipeline
(rasterizer_impl.cu:70-138): pair expansion, [tile|depth] key sort, tile
ranges — plus the static-shape overflow policies the CUDA version did not
need (it resized buffers dynamically, rasterize_points.cu:27-33).

Both generations are tested: v1 (scatter+cummax expansion, global max_pairs
cap) and v2 (fixed-slots-per-class expansion, per-class capacities — the
default).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.ops import binning
from pcp_tpu.ops.binning import _bin_gaussians_v1, bin_gaussians_v2

TX, TY = 4, 4


def _bins(version, rect, depths, max_pairs=256, max_per_tile=8):
    rect = jnp.asarray(rect, jnp.int32)
    depths = jnp.asarray(depths, jnp.float32)
    if version == "v2":
        return bin_gaussians_v2(rect, depths, TX, TY, max_per_tile)
    return _bin_gaussians_v1(rect, depths, TX, TY, max_pairs, max_per_tile)


@pytest.fixture(params=["v1", "v2"])
def version(request):
    return request.param


def test_within_tile_depth_order(version):
    # three gaussians on the same tile, shuffled depths
    rect = [[1, 1, 2, 2]] * 3
    depths = [5.0, 1.0, 3.0]
    b = _bins(version, rect, depths)
    tile = 1 * TX + 1
    ids = np.asarray(b.tile_gauss[tile])[: int(b.tile_count[tile])]
    assert list(ids) == [1, 2, 0]  # nearest first
    assert int(b.n_dropped) == 0


def test_v1_pair_overflow_drops_farthest():
    # 8 single-tile gaussians but room for only 5 pairs: the 5 NEAREST
    # must survive, regardless of index order. (v1's global max_pairs cap;
    # v2 has no global cap — its static capacities are per class.)
    n = 8
    rng = np.random.default_rng(0)
    depths = rng.permutation(np.arange(1, n + 1)).astype(np.float32)
    rect = [[i % TX, i // TX, i % TX + 1, i // TX + 1] for i in range(n)]
    b = _bins("v1", rect, depths, max_pairs=5)
    assert int(b.n_pairs) == n  # pre-cap count reports the true total
    assert int(b.n_dropped) == 3
    kept = set()
    for t in range(TX * TY):
        kept |= set(np.asarray(b.tile_gauss[t])[: int(b.tile_count[t])].tolist())
    want = set(np.argsort(depths)[:5].tolist())
    assert kept == want


def test_per_tile_saturation_keeps_nearest_and_reports_load(version):
    n = 6
    rect = [[0, 0, 1, 1]] * n
    depths = np.asarray([6.0, 2.0, 4.0, 1.0, 5.0, 3.0])
    b = _bins(version, rect, depths, max_per_tile=3)
    assert int(b.max_tile_load) == n  # pre-clamp occupancy surfaced
    ids = np.asarray(b.tile_gauss[0])[: int(b.tile_count[0])]
    assert list(ids) == [3, 1, 5]  # three nearest, ordered near-to-far


def test_multi_tile_spans(version):
    # one gaussian covering a 2x2 tile rect lands in all four tiles
    b = _bins(version, [[1, 1, 3, 3]], [2.0])
    hit = {
        t for t in range(TX * TY) if int(b.tile_count[t]) > 0
    }
    assert hit == {1 * TX + 1, 1 * TX + 2, 2 * TX + 1, 2 * TX + 2}
    assert int(b.n_pairs) == 4
    assert int(b.max_tile_load) == 1


def test_versions_agree_randomized():
    """v1 and v2 must produce identical per-tile lists on a random scene
    with ample capacity (no caps active in either)."""
    rng = np.random.default_rng(42)
    n = 200
    x0 = rng.integers(0, TX, n)
    y0 = rng.integers(0, TY, n)
    wx = rng.integers(0, TX - x0 + 1, n)
    wy = rng.integers(0, TY - y0 + 1, n)
    rect = np.stack([x0, y0, x0 + wx, y0 + wy], axis=1)
    depths = rng.uniform(0.5, 50.0, n).astype(np.float32)
    b1 = _bins("v1", rect, depths, max_pairs=4096, max_per_tile=256)
    b2 = _bins("v2", rect, depths, max_per_tile=256)
    np.testing.assert_array_equal(np.asarray(b1.tile_count),
                                  np.asarray(b2.tile_count))
    np.testing.assert_array_equal(np.asarray(b1.tile_gauss),
                                  np.asarray(b2.tile_gauss))
    assert int(b1.n_pairs) == int(b2.n_pairs)
    assert int(b2.n_dropped) == 0


def test_v2_class_tables_route_large_footprints(monkeypatch):
    """Footprints > R1 go through the compacted class-B/C tables and still
    land on every covered tile; capacity overruns are counted, not silent."""
    monkeypatch.setattr(binning, "R1", 2)
    monkeypatch.setattr(binning, "R2", 6)
    monkeypatch.setattr(binning, "R3", 16)
    # one 1-tile (A), one 2x2=4-tile (B), one 4x3=12-tile (C)
    rect = [[0, 0, 1, 1], [1, 1, 3, 3], [0, 0, 4, 3]]
    depths = [1.0, 2.0, 3.0]
    b = _bins("v2", rect, depths, max_per_tile=8)
    assert int(b.n_pairs) == 1 + 4 + 12
    assert int(b.n_dropped) == 0
    got = np.asarray(b.tile_count).reshape(TY, TX)
    want = np.zeros((TY, TX), np.int64)
    want[0:3, 0:4] += 1          # the 12-tile C gaussian
    want[1:3, 1:3] += 1          # the 4-tile B gaussian
    want[0, 0] += 1              # the 1-tile A gaussian
    np.testing.assert_array_equal(got, want)
    # tile (1,1): A absent, B (depth 2) before C (depth 3)
    t = 1 * TX + 1
    assert list(np.asarray(b.tile_gauss[t])[: int(b.tile_count[t])]) == [1, 2]


def test_v2_footprint_beyond_r3_is_lossless(monkeypatch):
    """Footprints > R3 land in class D, whose rows span the whole tile
    grid — every pair survives (truncation is structurally impossible)."""
    monkeypatch.setattr(binning, "R1", 2)
    monkeypatch.setattr(binning, "R2", 4)
    monkeypatch.setattr(binning, "R3", 8)
    b = _bins("v2", [[0, 0, 4, 3]], [1.0], max_per_tile=8)
    assert int(b.n_pairs) == 12
    assert int(b.n_dropped) == 0
    got = np.asarray(b.tile_count).reshape(TY, TX)
    assert got[:3, :4].sum() == 12 and got.sum() == 12


def test_v2_class_d_table_overflow_is_counted(monkeypatch):
    """More >R3 Gaussians than class-D rows: the excess is dropped AND
    counted (the honest-bench contract surfaces it as overflow)."""
    monkeypatch.setattr(binning, "R1", 2)
    monkeypatch.setattr(binning, "R2", 4)
    monkeypatch.setattr(binning, "R3", 8)
    # cap_d = max(n // CAPD_DIV, 8) = 8 rows; 9 monsters of 12 tiles each
    rect = [[0, 0, 4, 3]] * 9
    b = _bins("v2", rect, list(np.arange(9) + 1.0), max_per_tile=16)
    assert int(b.n_pairs) == 9 * 12
    assert int(b.n_dropped) == 12  # exactly one whole row's worth


def test_autosize_max_per_tile():
    import numpy as np

    from pcp_tpu.ops.binning import autosize_max_per_tile

    # 10 gaussians covering tile (2,3) through overlapping rects; exact
    # max load must be 10 -> ceil(1.6*10/128)*128 clamped to floor 128
    rect = np.tile(np.array([[1, 2, 4, 5]]), (10, 1)).astype(np.int32)
    k = autosize_max_per_tile([(rect, 8, 8)], chunk=128)
    assert k == 128
    # heavy synthetic load: 900 rects over one tile -> 1.6*900 = 1440 ->
    # next multiple of 128 is 1536
    rect = np.tile(np.array([[0, 0, 1, 1]]), (900, 1)).astype(np.int32)
    assert autosize_max_per_tile([(rect, 4, 4)], chunk=128) == 1536
    # cap and empty-view behaviour: cap bounds HEADROOM only — the table
    # must still cover the measured max load (90000 -> ceil to chunk),
    # never force standing drops (the round-3 scale-run recompile storm)
    assert autosize_max_per_tile([(rect[:0], 4, 4)], chunk=128) == 128
    rect = np.tile(np.array([[0, 0, 1, 1]]), (90000, 1)).astype(np.int32)
    assert autosize_max_per_tile([(rect, 4, 4)], chunk=128) == 90112
    # a cap above the measured load still clamps headroom (1.6x -> 144000)
    assert autosize_max_per_tile([(rect, 4, 4)], chunk=128,
                                 cap=131072) == 131072
    # rects clamped to the grid edge must not overflow the diff array
    rect = np.array([[6, 6, 8, 8]], np.int32)
    assert autosize_max_per_tile([(rect, 8, 8)], chunk=128) == 128


def test_active_cap_equivalence_with_dead_slots():
    """Alive-scaled class tables (active_cap >= alive count) must produce
    IDENTICAL per-tile lists to the capacity-scaled default on a padded
    buffer where most slots are dead (zero-extent rects) — the production
    shape after the training loop's re-tuner kicks in."""
    rng = np.random.default_rng(7)
    n_alive, n_total = 120, 1024
    x0 = rng.integers(0, TX, n_alive)
    y0 = rng.integers(0, TY, n_alive)
    wx = rng.integers(1, TX - x0 + 1, n_alive)
    wy = rng.integers(1, TY - y0 + 1, n_alive)
    rect = np.zeros((n_total, 4), np.int32)
    rect[:n_alive] = np.stack([x0, y0, x0 + wx, y0 + wy], axis=1)
    depths = np.full(n_total, 1e9, np.float32)
    depths[:n_alive] = rng.uniform(0.5, 50.0, n_alive)
    b_full = _bins("v2", rect, depths, max_per_tile=256)
    b_cap = bin_gaussians_v2(jnp.asarray(rect), jnp.asarray(depths),
                             TX, TY, 256, active_cap=256)
    np.testing.assert_array_equal(np.asarray(b_full.tile_count),
                                  np.asarray(b_cap.tile_count))
    np.testing.assert_array_equal(np.asarray(b_full.tile_gauss),
                                  np.asarray(b_cap.tile_gauss))
    assert int(b_cap.n_pairs) == int(b_full.n_pairs)
    assert int(b_cap.n_dropped) == 0


def test_active_cap_levels_equivalence():
    """Same equivalence through the N-level builder: window contents and
    drop accounting are unchanged by the alive-scaled expansion."""
    from pcp_tpu.ops.binning import bin_gaussians_levels

    rng = np.random.default_rng(11)
    n_alive, n_total = 150, 2048
    x0 = rng.integers(0, TX, n_alive)
    y0 = rng.integers(0, TY, n_alive)
    rect = np.zeros((n_total, 4), np.int32)
    rect[:n_alive] = np.stack([x0, y0, x0 + 1, y0 + 1], axis=1)
    depths = np.full(n_total, 1e9, np.float32)
    depths[:n_alive] = rng.uniform(0.5, 50.0, n_alive)
    kw = dict(k0=8, levels=((16, 8), (32, 4)))
    b_full = bin_gaussians_levels(jnp.asarray(rect), jnp.asarray(depths),
                                  TX, TY, **kw)
    b_cap = bin_gaussians_levels(jnp.asarray(rect), jnp.asarray(depths),
                                 TX, TY, active_cap=256, **kw)
    np.testing.assert_array_equal(np.asarray(b_full.base),
                                  np.asarray(b_cap.base))
    for t_f, t_c in zip(b_full.tables, b_cap.tables):
        np.testing.assert_array_equal(np.asarray(t_f), np.asarray(t_c))
    for i_f, i_c in zip(b_full.ids, b_cap.ids):
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_c))
    # (the tiny k-geometry makes some tiles overflow their level and fall
    # back to the k0-truncated base — identical drops in both modes)
    assert int(b_cap.n_dropped) == int(b_full.n_dropped)


def test_active_cap_overflow_is_counted():
    """Population beyond active_cap: the excess class-A rows are dropped
    AND counted (the re-tuner keys its emergency re-tune off this)."""
    n = 64
    rect = np.array([[i % TX, i // TY, i % TX + 1, i // TY + 1]
                     for i in range(n)], np.int32) % [TX, TY, TX + 1, TY + 1]
    rect = np.stack([rect[:, 0], rect[:, 1],
                     rect[:, 0] + 1, rect[:, 1] + 1], axis=1).astype(np.int32)
    depths = np.arange(1, n + 1, dtype=np.float32)
    b = bin_gaussians_v2(jnp.asarray(rect), jnp.asarray(depths),
                         TX, TY, 64, active_cap=48)
    assert int(b.n_pairs) == n          # true pre-cap total still reported
    assert int(b.n_dropped) == n - 48   # the excess is counted, not silent


def test_pair_levels_equivalence():
    """A measured footprint ladder that covers the population reproduces
    the legacy class geometry's windows and drop accounting exactly."""
    rng = np.random.default_rng(5)
    n = 512
    x0 = rng.integers(0, TX, n)
    y0 = rng.integers(0, TY, n)
    wx = np.minimum(rng.integers(1, 4, n), TX - x0)
    wy = np.minimum(rng.integers(1, 4, n), TY - y0)
    rect = np.stack([x0, y0, x0 + wx, y0 + wy], axis=1).astype(np.int32)
    depths = rng.uniform(0.5, 50.0, n).astype(np.float32)
    b_ref = _bins("v2", rect, depths, max_per_tile=256)
    b_lvl = bin_gaussians_v2(
        jnp.asarray(rect), jnp.asarray(depths), TX, TY, 256,
        pair_levels=((2, 512), (4, 512), (9, 256)))
    np.testing.assert_array_equal(np.asarray(b_ref.tile_gauss),
                                  np.asarray(b_lvl.tile_gauss))
    np.testing.assert_array_equal(np.asarray(b_ref.tile_count),
                                  np.asarray(b_lvl.tile_count))
    assert int(b_lvl.n_pairs) == int(b_ref.n_pairs)
    assert int(b_lvl.n_dropped) == 0


def test_pair_levels_band_overflow_is_counted():
    """Gaussians past a band's capacity are dropped AND counted — the
    re-tuner's reactive-resize signal."""
    n = 32
    rect = np.stack([np.arange(n) % TX, np.arange(n) // TX % TY], axis=1)
    rect = np.concatenate([rect, rect + 1], axis=1).astype(np.int32)
    depths = np.arange(1, n + 1, dtype=np.float32)
    b = bin_gaussians_v2(jnp.asarray(rect), jnp.asarray(depths), TX, TY, 64,
                         pair_levels=((1, 8),))
    # 32 one-tile footprints into an 8-cap band: 24 whole Gaussians drop
    assert int(b.n_pairs) == n
    assert int(b.n_dropped) == n - 8


def test_footprint_bands_and_choose_pair_levels():
    from pcp_tpu.ops.binning import (PAIR_BOUNDS, choose_pair_levels,
                                     footprint_band_counts_device)

    rect = np.array([
        [0, 0, 0, 0],      # culled: no band
        [0, 0, 1, 1],      # 1 tile  -> band (0, 4]
        [0, 0, 2, 2],      # 4 tiles -> band (0, 4]
        [0, 0, 3, 2],      # 6       -> (4, 8]
        [0, 0, 4, 3],      # 12      -> (8, 16]
        [0, 0, 10, 10],    # 100     -> (64, 512]
        [0, 0, 40, 40],    # 1600    -> beyond
    ], np.int32)
    bc = np.asarray(footprint_band_counts_device(jnp.asarray(rect)))
    assert bc.tolist() == [2, 1, 1, 0, 0, 1, 0, 0, 1]

    lv = choose_pair_levels(bc[None, :])
    rs = [r for r, _ in lv]
    # empty interior bands are elided; the last bound always survives,
    # and a trailing (0, cap) entry sizes the num_tiles-wide safety
    # class from the MEASURED beyond-bound population
    assert rs == [4, 8, 16, 128, 512, 0]
    assert all(c >= 1024 for _, c in lv[:-1])
    assert lv[-1][0] == 0 and lv[-1][1] >= 8    # 1 beyond-bound splat
    assert list(PAIR_BOUNDS) == [4, 8, 16, 32, 64, 128, 256, 512]
