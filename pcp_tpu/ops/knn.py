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
    # isotropic quantisation: per-axis scaling distorts distance locality on
    # flat (aerial-survey-like) clouds
    scale = (2.0**_MORTON_BITS - 1.0) / jnp.maximum(jnp.max(hi - lo), 1e-12)
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


def _window_cands_all(points: jnp.ndarray, window: int) -> jnp.ndarray:
    """(N, 6*window) deduped candidate ids from 3 Morton orderings
    (sorted per row; duplicates replaced by the point's own id so the
    distance pass masks them as self)."""
    n = points.shape[0]
    cands = jnp.concatenate(
        [
            _window_candidates(jnp.argsort(morton_codes(points, perm)), window)
            for perm in ((0, 1, 2), (1, 2, 0), (2, 0, 1))
        ],
        axis=1,
    )
    cands = jnp.sort(cands, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((n, 1), bool), cands[:, 1:] == cands[:, :-1]], axis=1
    )
    return jnp.where(dup, jnp.arange(n)[:, None], cands)


def _cand_d2_sorted(points, cands, row0: int) -> jnp.ndarray:
    """Sorted squared distances for candidate rows [row0, row0+len(cands))
    (self/dup candidates are +inf)."""
    rows = points[row0 + jnp.arange(cands.shape[0])]
    d2 = jnp.sum((rows[:, None, :] - points[cands]) ** 2, axis=-1)
    self_ = cands == (row0 + jnp.arange(cands.shape[0]))[:, None]
    d2 = jnp.where(self_, jnp.inf, d2)
    return jnp.sort(d2, axis=1)


def _knn_window_d2(points: jnp.ndarray, window: int) -> jnp.ndarray:
    """(N, 6*window) sorted squared candidate distances (small-N path)."""
    cands = _window_cands_all(points, window)
    return _cand_d2_sorted(points, cands, 0)


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

    top3 = _knn_window_d2(points, window)[:, :3]
    finite = jnp.isfinite(top3)
    cnt = jnp.maximum(jnp.sum(finite, axis=1), 1)
    mean = jnp.sum(jnp.where(finite, top3, 0.0), axis=1) / cnt
    return jnp.maximum(mean, 1e-7)


def kth_nn_dist2_np(points, k: int, window: int = 16, chunk: int = 1 << 20):
    """Numpy twin of :func:`kth_nn_dist2` for host-side pipelines (the
    partitioner's outlier filter): XLA-on-CPU row gathers are ~100x slower
    than numpy fancy indexing at 5M points, so the host path stays numpy.
    """
    import numpy as np

    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    if n <= k:
        return np.full((n,), np.inf, np.float32)

    def codes(perm):
        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
        scale = 1023.0 / max((hi - lo).max(), 1e-12)  # isotropic
        q = np.clip((pts - lo) * scale, 0, 1023).astype(np.uint32)

        def expand(v):
            v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
            v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
            v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
            v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
            return v

        a, b, c = perm
        return (
            expand(q[:, a])
            | (expand(q[:, b]) << np.uint32(1))
            | (expand(q[:, c]) << np.uint32(2))
        )

    offs = np.concatenate(
        [np.arange(-window, 0), np.arange(1, window + 1)]
    )[None, :]
    pos = np.arange(n)[:, None]
    cands_parts = []
    for perm in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        order = np.argsort(codes(perm), kind="stable")
        neigh = order[np.clip(pos + offs, 0, n - 1)]
        inv = np.empty(n, np.int64)
        inv[order] = np.arange(n)
        cands_parts.append(neigh[inv])
    cands = np.concatenate(cands_parts, axis=1)

    cands.sort(axis=1)  # per-row: duplicates become adjacent
    out = np.empty((n,), np.float32)
    for r0 in range(0, n, chunk):
        r1 = min(r0 + chunk, n)
        c = cands[r0:r1]
        d2 = ((pts[r0:r1, None, :] - pts[c]) ** 2).sum(-1)
        invalid = c == np.arange(r0, r1)[:, None]          # self
        invalid[:, 1:] |= c[:, 1:] == c[:, :-1]            # duplicates
        d2[invalid] = np.inf
        out[r0:r1] = np.partition(d2, k - 1, axis=1)[:, k - 1]
    return out


def kth_nn_dist2(points, k: int, window: int = 16, chunk: int = 1 << 19):
    """Approximate squared distance to the k-th nearest neighbour (may
    overestimate when a true neighbour falls outside every Morton window —
    used by the outlier filter, where overestimates only make the filter
    marginally stricter). Device (TPU) path: candidate windows come from the
    full-cloud orderings; the distance pass runs in padded row chunks."""
    import functools

    import jax

    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    if n <= k:
        return jnp.full((n,), jnp.inf, jnp.float32)
    assert k <= 6 * window, (k, window)
    if n <= chunk:
        return _knn_window_d2(points, window)[:, k - 1]

    # Memory-light large-N path: per Morton ordering, keep only each
    # point's top-k (distance, id) among its +/-window neighbours (chunked,
    # so the live set is O(chunk * window)); then merge the three k-lists,
    # dedup by id, and take the k-th. Never materialises (N, 6*window).
    n_pad = ((n + chunk - 1) // chunk) * chunk

    @functools.partial(jax.jit, static_argnames=())
    def chunk_topk(pts, cand_rows, row0):
        rows = pts[jnp.clip(row0 + jnp.arange(chunk), 0, n - 1)]
        d2 = jnp.sum((rows[:, None, :] - pts[cand_rows]) ** 2, axis=-1)
        self_ = cand_rows == (row0 + jnp.arange(chunk))[:, None]
        d2 = jnp.where(self_, jnp.inf, d2)
        sd2, sid = jax.lax.sort(
            (d2, cand_rows.astype(jnp.int32)), num_keys=1
        )
        return sd2[:, :k], sid[:, :k]

    per_ord_d2, per_ord_id = [], []
    for perm in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        order = jnp.argsort(morton_codes(points, perm))
        cands = _window_candidates(order, window)
        cands_p = jnp.zeros((n_pad, cands.shape[1]), cands.dtype).at[:n].set(
            cands
        )
        ds, ids = [], []
        for r0 in range(0, n_pad, chunk):
            sd2, sid = chunk_topk(points, cands_p[r0:r0 + chunk], jnp.int32(r0))
            ds.append(sd2)
            ids.append(sid)
        per_ord_d2.append(jnp.concatenate(ds)[:n])
        per_ord_id.append(jnp.concatenate(ids)[:n])

    d2 = jnp.concatenate(per_ord_d2, axis=1)   # (N, 3k)
    ids = jnp.concatenate(per_ord_id, axis=1)  # (N, 3k)
    # dedup by id (same neighbour found by several orderings)
    sid, sd2 = jax.lax.sort((ids, d2), num_keys=1)
    dup = jnp.concatenate(
        [jnp.zeros((n, 1), bool), sid[:, 1:] == sid[:, :-1]], axis=1
    )
    sd2 = jnp.where(dup, jnp.inf, sd2)
    return jnp.sort(sd2, axis=1)[:, k - 1]
