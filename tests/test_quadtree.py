"""Legacy quadtree partitioner (shen_partition.py:40-788 parity)."""

import numpy as np

from pcp_tpu.partition.quadtree import (
    Region,
    expand_regions,
    filter_regions_by_point_count,
    merge_regions,
    quad_tree_partition,
    regions_adjacent,
)
from pcp_tpu.partition.types import Box2D


def test_quadtree_invariants(rng):
    xy = rng.uniform(-10, 10, size=(5000, 2)).astype(np.float32)
    leaves = quad_tree_partition(xy, threshold=600)
    # every point lands in exactly one leaf
    total = np.concatenate([r.point_indices for r in leaves])
    assert sorted(total.tolist()) == list(range(len(xy)))
    # leaves respect the threshold (at sane depth)
    assert all(r.point_num <= 600 for r in leaves)
    # ids are quadrant digit strings
    assert all(set(r.region_id) <= set("0123") for r in leaves)


def test_adjacency_and_merge():
    a = Region("0", [Box2D(0, 0, 1, 1)], np.arange(5))
    b = Region("1", [Box2D(1, 0, 2, 1)], np.arange(5, 8))
    c = Region("3", [Box2D(5, 5, 6, 6)], np.arange(8, 9))
    assert regions_adjacent(a, b)
    assert not regions_adjacent(a, c)
    m = merge_regions(a, b)
    assert m.region_id == "0-1"
    assert m.point_num == 8
    # merged region is adjacent to anything either part touched
    d = Region("2", [Box2D(2, 0, 3, 1)], np.arange(9, 12))
    assert regions_adjacent(m, d)


def test_filter_merges_small_regions(rng):
    # clustered cloud -> unbalanced quadtree -> small leaves get absorbed
    dense = rng.normal(0, 1, size=(4000, 2))
    sparse = rng.uniform(5, 15, size=(60, 2))
    xy = np.concatenate([dense, sparse]).astype(np.float32)
    leaves = quad_tree_partition(xy, threshold=1500)
    merged = filter_regions_by_point_count(leaves, threshold_value=3000)
    assert len(merged) <= len(leaves)
    # nothing under min_threshold survives
    assert all(r.point_num >= 10 for r in merged)
    # the merge respects the hard cap
    assert all(r.point_num <= 3000 or r.point_num == max(
        l.point_num for l in leaves) for r in merged)


def test_expand_regions_grows_point_sets(rng):
    xy = rng.uniform(-10, 10, size=(3000, 2)).astype(np.float32)
    leaves = quad_tree_partition(xy, threshold=900)
    expanded = expand_regions(leaves, xy, base_expansion_rate=0.2)
    for le, ex in zip(leaves, expanded):
        assert ex.point_num >= le.point_num
        assert ex.extend_rate == 0.2
        assert len(ex.extend_boxes) == len(le.boxes)
