"""Tiled rasterizer vs dense CUDA-semantics oracle + gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.ops.oracle import rasterize_dense
from pcp_tpu.ops.projection import CameraIntrin, preprocess
from pcp_tpu.ops.rasterize import rasterize

W, H = 48, 32
INTRIN = CameraIntrin(
    fx=jnp.float32(40.0), fy=jnp.float32(40.0),
    cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
)
BG = jnp.zeros(3, jnp.float32)


def _scene(rng, n, sh_degree=0):
    k = (sh_degree + 1) ** 2
    xyz = np.stack(
        [
            rng.uniform(-2.0, 2.0, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(2.0, 6.0, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scales = rng.uniform(0.05, 0.3, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    sh = rng.uniform(-0.3, 0.8, size=(n, k, 3)).astype(np.float32)
    viewmat = np.eye(4, dtype=np.float32)
    return tuple(jnp.asarray(a) for a in (xyz, scales, quats, opac, sh)) + (
        jnp.asarray(viewmat),
    )


@pytest.mark.parametrize("n,deg", [(1, 0), (20, 0), (120, 3)])
def test_matches_dense_oracle(rng, n, deg):
    xyz, scales, quats, opac, sh, viewmat = _scene(rng, n, deg)
    img, aux = rasterize(
        xyz, scales, quats, opac, sh, viewmat, INTRIN, (W, H), BG, deg,
        max_per_tile=256, chunk=16, tile_batch=2,
    )
    want, want_t = rasterize_dense(
        xyz, scales, quats, opac, sh, viewmat, INTRIN, (W, H), BG, deg
    )
    np.testing.assert_allclose(np.asarray(img), want, atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux["final_t"]), want_t, atol=2e-5)


def test_background_fills_empty(rng):
    xyz, scales, quats, opac, sh, viewmat = _scene(rng, 1)
    xyz = xyz + jnp.asarray([100.0, 100.0, 0.0])  # off-screen
    bg = jnp.asarray([0.2, 0.4, 0.6])
    img, _ = rasterize(
        xyz, scales, quats, opac, sh, viewmat, INTRIN, (W, H), bg, 0
    )
    np.testing.assert_allclose(np.asarray(img), np.broadcast_to(bg, (H, W, 3)),
                               atol=1e-6)


def test_depth_ordering(rng):
    # A red Gaussian in front of a green one at the same center: front wins.
    xyz = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 5.0]])
    scales = jnp.full((2, 3), 0.3)
    quats = jnp.asarray([[1.0, 0, 0, 0]] * 2)
    opac = jnp.asarray([0.9, 0.9])
    sh = jnp.zeros((2, 1, 3)).at[0, 0, 0].set(2.0).at[1, 0, 1].set(2.0)
    img, _ = rasterize(
        xyz, scales, quats, opac, sh, jnp.eye(4), INTRIN, (W, H), BG, 0
    )
    center = np.asarray(img[H // 2, W // 2])
    assert center[0] > center[1] > 0.0


def test_gradients_match_finite_differences(rng):
    xyz, scales, quats, opac, sh, viewmat = _scene(rng, 8)

    def loss(xyz, sh, opac, scales):
        img, _ = rasterize(
            xyz, scales, quats, opac, sh, viewmat, INTRIN, (W, H), BG, 0,
            max_per_tile=64, chunk=8, tile_batch=2,
        )
        return jnp.sum(img * img)

    from jax.test_util import check_grads

    check_grads(loss, (xyz, sh, opac, scales), order=1, modes=["rev"],
                atol=5e-2, rtol=5e-2, eps=1e-3)


def test_means2d_offset_probe_gradient(rng):
    # The zero screen-space offset input must receive dL/dmeans2d — the
    # densification signal (train.py:140-147 viewspace grad accumulation).
    xyz, scales, quats, opac, sh, viewmat = _scene(rng, 8)
    probe = jnp.zeros((8, 2))

    def loss(probe):
        img, _ = rasterize(
            xyz, scales, quats, opac, sh, viewmat, INTRIN, (W, H), BG, 0,
            means2d_offset=probe,
        )
        return jnp.sum(img)

    g = jax.grad(loss)(probe)
    assert np.asarray(jnp.abs(g)).sum() > 0.0


def test_preprocess_culls_behind_camera(rng):
    xyz = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.0, 3.0]])
    prep = preprocess(
        xyz, jnp.full((2, 3), 0.1), jnp.asarray([[1.0, 0, 0, 0]] * 2),
        jnp.asarray([0.9, 0.9]), jnp.zeros((2, 1, 3)), jnp.eye(4),
        INTRIN, (W, H), 0,
    )
    assert not bool(prep["visible"][0])
    assert bool(prep["visible"][1])
    assert float(prep["radii"][0]) == 0.0


def test_segsum_pos_branches_identical(rng):
    # The segment-sum gradient reduction recovers sentinel positions two
    # ways: from footprint counts (exact_ok, the no-drop fast path) or an
    # inverse-permutation sort (lossy-frame fallback). Both must produce
    # the SAME per-Gaussian sums, and match the plain scatter-add gather
    # backward to prefix-sum accuracy.
    from pcp_tpu.ops.rasterize import _gather_rows_segsum

    N, nt, K, NA = 300, 80, 16, 9
    pack = jnp.asarray(rng.normal(size=(NA, N)).astype(np.float32))
    counts = rng.integers(0, 6, N).astype(np.int32)
    gids = np.repeat(np.arange(N), counts)
    ids = np.full(nt * K, -1, np.int64)
    ids[: gids.size] = rng.permutation(gids)
    ids = ids.reshape(nt, K)
    idc = jnp.asarray(np.maximum(ids, 0).astype(np.int32))
    valid = jnp.asarray((ids >= 0).astype(np.float32))
    cnt = jnp.asarray(counts)
    weight = jnp.arange(NA * nt * K, dtype=jnp.float32).reshape(NA, nt, K)

    def loss(pack, ok):
        att = _gather_rows_segsum(pack, idc, cnt, jnp.asarray(ok))
        return jnp.sum(jnp.sin(att * valid[None]) * weight)

    def loss_ref(pack):
        att = jax.vmap(lambda v: v[idc])(pack)
        return jnp.sum(jnp.sin(att * valid[None]) * weight)

    g_ref = jax.grad(loss_ref)(pack)
    g_counts = jax.grad(loss, argnums=0)(pack, True)
    g_sort = jax.grad(loss, argnums=0)(pack, False)
    assert float(jnp.abs(g_counts - g_sort).max()) == 0.0
    scale = float(jnp.abs(g_ref).max())
    assert float(jnp.abs(g_counts - g_ref).max()) / scale < 1e-4
