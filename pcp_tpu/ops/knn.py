"""Approximate 3-nearest-neighbour mean squared distance, TPU-native.

Replaces the reference's `simple-knn` CUDA extension
(submodules/simple-knn/simple_knn.cu:12-221, spatial.cu:15-26), whose single
job is Gaussian scale initialisation: for every point, the mean of the squared
distances to its 3 nearest neighbours (gaussian_model.py:144).

The CUDA version Morton-sorts the points and scans candidate boxes. Here we
use the same spatial-locality idea as pure XLA ops (this runs once per block
at model init, so simplicity beats a hand-tuned kernel):

1. Morton-encode points (simple_knn.cu:45-70 semantics, vectorised) under
   three axis-permuted bit interleavings.
2. One `jnp.argsort` per ordering (XLA sort, replacing CUB radix sort).
3. Candidate set per point = the +/- ``window`` neighbours in each of three
   axis-permuted Morton orders; gather, dedup (per-row index sort), take the
   3 smallest squared distances via one small sort.

Accuracy: exact on clustered (surface-like) clouds — the SfM case; on
worst-case uniform random points ~72% of results are exact and the rest are
bounded overestimates, which is benign for scale init (densification
self-corrects scales during training).

Clamped to 1e-7 minimum exactly as distCUDA2's usage site does
(gaussian_model.py:144).
"""

from __future__ import annotations

import jax.numpy as jnp

_MORTON_BITS = 10  # 10 bits/axis -> 30-bit codes (simple_knn.cu coord2Morton)


def _expand_bits(v):
    """Spread the low 10 bits of ``v`` with 2 zero bits between each
    (simple_knn.cu:45-56 `prepMorton`)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(points: jnp.ndarray, perm=(0, 1, 2)) -> jnp.ndarray:
    """30-bit Morton codes for (N, 3) points (simple_knn.cu:58-70).

    ``perm`` permutes which axis gets which interleave position; different
    permutations have different locality failure modes, so unioning the
    candidate windows of several orderings recovers most missed neighbours.
    """
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    scale = (2.0**_MORTON_BITS - 1.0) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((points - lo) * scale, 0.0, 2.0**_MORTON_BITS - 1.0)
    q = q.astype(jnp.uint32)
    a, b, c = perm
    return (
        _expand_bits(q[:, a])
        | (_expand_bits(q[:, b]) << jnp.uint32(1))
        | (_expand_bits(q[:, c]) << jnp.uint32(2))
    ).astype(jnp.uint32)


def _window_candidates(order: jnp.ndarray, window: int) -> jnp.ndarray:
    """(N, 2*window) original-index candidates from a Morton ordering."""
    n = order.shape[0]
    pos = jnp.arange(n)[:, None]  # position in sorted order
    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )[None, :]
    neigh_pos = jnp.clip(pos + offs, 0, n - 1)
    cands_sorted = order[neigh_pos]  # (N, 2w) candidates for sorted row i
    # Re-index rows back to original point ids.
    inv = jnp.zeros((n,), order.dtype).at[order].set(jnp.arange(n, dtype=order.dtype))
    return cands_sorted[inv]


def mean_sq_dist_3nn(points: jnp.ndarray, window: int = 16) -> jnp.ndarray:
    """Per-point mean squared distance to the (approximate) 3 nearest
    neighbours. (N,) float32, clamped to >= 1e-7."""
    points = points.astype(jnp.float32)
    n = points.shape[0]
    if n <= 4:
        d2 = jnp.sum((points[:, None] - points[None, :]) ** 2, axis=-1)
        d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
        k = min(3, n - 1)
        top = jnp.sort(d2, axis=1)[:, :k]
        return jnp.maximum(jnp.mean(top, axis=1), 1e-7)

    cands = jnp.concatenate(
        [
            _window_candidates(jnp.argsort(morton_codes(points, perm)), window)
            for perm in ((0, 1, 2), (1, 2, 0), (2, 0, 1))
        ],
        axis=1,
    )  # (N, 6w)
    # Dedup: sort candidate ids per row, mask repeats and self.
    cands = jnp.sort(cands, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((n, 1), bool), cands[:, 1:] == cands[:, :-1]], axis=1
    )
    self_ = cands == jnp.arange(n)[:, None]
    d2 = jnp.sum((points[:, None, :] - points[cands]) ** 2, axis=-1)
    d2 = jnp.where(dup | self_, jnp.inf, d2)
    top3 = jnp.sort(d2, axis=1)[:, :3]
    finite = jnp.isfinite(top3)
    cnt = jnp.maximum(jnp.sum(finite, axis=1), 1)
    mean = jnp.sum(jnp.where(finite, top3, 0.0), axis=1) / cnt
    return jnp.maximum(mean, 1e-7)
