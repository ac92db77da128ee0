"""ops/knn vs a brute-force 3-NN oracle (simple-knn semantics)."""

import jax.numpy as jnp
import numpy as np

from pcp_tpu.ops.knn import mean_sq_dist_3nn, morton_codes


def _oracle(points):
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    part = np.sort(d2, axis=1)[:, :3]
    return np.maximum(part.mean(axis=1), 1e-7)


def test_knn_exact_on_clustered(rng):
    # Clustered points: Morton window easily covers the true 3-NN.
    centers = rng.uniform(-10, 10, size=(20, 3))
    pts = (centers[:, None, :] + 0.01 * rng.normal(size=(20, 8, 3))).reshape(-1, 3)
    got = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts), window=24))
    want = _oracle(pts).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_knn_approx_on_uniform(rng):
    pts = rng.uniform(0, 1, size=(500, 3))
    got = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts), window=16))
    want = _oracle(pts).astype(np.float32)
    # Approximate: overestimates only (never misses a closer point it saw),
    # the bulk exact, and errors bounded (benign for scale init).
    assert np.all(got >= want * (1 - 1e-4))
    frac_exact = np.mean(np.isclose(got, want, rtol=1e-3))
    assert frac_exact > 0.65, frac_exact
    assert np.mean(got / want) < 1.25


def test_morton_locality(rng):
    pts = rng.uniform(size=(100, 3)).astype(np.float32)
    codes = np.asarray(morton_codes(jnp.asarray(pts)))
    assert codes.dtype == np.uint32
    # identical points share codes
    codes2 = np.asarray(morton_codes(jnp.asarray(np.vstack([pts, pts[:1]]))))
    assert codes2[-1] == codes2[0]


def test_knn_tiny_counts():
    pts = jnp.asarray(np.array([[0.0, 0, 0], [1, 0, 0]], np.float32))
    out = np.asarray(mean_sq_dist_3nn(pts))
    np.testing.assert_allclose(out, [1.0, 1.0], rtol=1e-5)


def test_kth_nn_dist2_np_matches_bruteforce(rng):
    from pcp_tpu.ops.knn import kth_nn_dist2_np

    pts = (rng.uniform(0, 1, (300, 3)) * [1, 1, 0.2]).astype(np.float32)
    got = kth_nn_dist2_np(pts, k=5, window=32)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, 4]
    # approximate, overestimates only; what the outlier filter consumes is
    # the *decision* kth-dist <= r, which must track the exact one closely
    assert np.all(got >= want - 1e-5)
    r2 = np.median(want)  # a discriminative radius
    agree = np.mean((got <= r2) == (want <= r2))
    assert agree > 0.9, agree
