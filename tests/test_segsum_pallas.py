"""Mosaic sorted-segment-sum kernel (ops/segsum_pallas) — interpret-mode
correctness vs a numpy scatter-add oracle. The compiled path is validated
on the real chip by tools/exp_segsum_scale.py (--only kernel_*) and the
TPU-vs-CPU parity gate."""

from __future__ import annotations

import numpy as np
import pytest

from pcp_tpu.ops.segsum_pallas import sorted_segment_sum


def _oracle(gs, gid, n):
    ref = np.zeros((gs.shape[0], n), np.float32)
    live = gid < n
    np.add.at(ref.T, gid[live], gs.T[live])
    return ref


def _run(gs, gid, n, mode="split"):
    import jax.numpy as jnp

    out = sorted_segment_sum(
        jnp.asarray(gs), jnp.asarray(gid), n, gb=128, chunk=256,
        mode=mode, interpret=True)
    return np.asarray(out)


@pytest.mark.parametrize("mode,tol", [("split", 1e-4), ("f32", 1e-5)])
def test_random_segments(mode, tol):
    rng = np.random.default_rng(0)
    n, m = 1024, 5000
    gid = np.sort(rng.integers(0, n, m)).astype(np.int32)
    gs = rng.normal(size=(9, m)).astype(np.float32)
    out = _run(gs, gid, n, mode)
    assert np.abs(out - _oracle(gs, gid, n)).max() < tol


def test_skewed_segment_spans_many_chunks():
    """One gid owning most columns exercises the multi-chunk inner loop
    of a single grid block."""
    rng = np.random.default_rng(1)
    n, m = 512, 4000
    gid = np.concatenate([
        np.zeros(3500, np.int32) + 7,
        np.sort(rng.integers(8, n, 500)).astype(np.int32)])
    gs = rng.normal(size=(9, m)).astype(np.float32)
    out = _run(gs, gid, n)
    ref = _oracle(gs, gid, n)
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-30) < 1e-4


def test_empty_blocks_and_pads():
    """Blocks with no columns stay zero; pad columns (gid == n) are
    dropped even with nonzero values."""
    rng = np.random.default_rng(2)
    n, m = 1024, 600
    gid = np.concatenate([
        np.sort(rng.integers(0, 128, 500)).astype(np.int32),
        np.full(100, n, np.int32)])          # pads at the end
    gs = rng.normal(size=(9, m)).astype(np.float32)
    out = _run(gs, gid, n)
    ref = _oracle(gs, gid, n)
    assert np.abs(out - ref).max() < 1e-4
    assert np.abs(out[:, 128:]).max() == 0.0


def test_block_boundary_alignment():
    """Segments straddling the chunk-aligned DMA window: the leading
    columns of a block's first chunk belong to the previous block and
    must be excluded by the one-hot range check."""
    rng = np.random.default_rng(3)
    n = 512
    # gids packed densely around the 128-gid block edges
    gid = np.sort(np.concatenate([
        np.full(300, 127, np.int32),         # end of block 0
        np.full(300, 128, np.int32),         # start of block 1
        rng.integers(0, n, 400).astype(np.int32)]))
    gs = rng.normal(size=(9, gid.shape[0])).astype(np.float32)
    out = _run(gs, gid, n)
    ref = _oracle(gs, gid, n)
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-30) < 1e-4
