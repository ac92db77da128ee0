"""Fused Pallas composite vs the XLA composite path, forward and backward.

Runs the kernels in interpreter mode on CPU; the same code compiles with
Mosaic on TPU (exercised by bench.py / the driver's TPU run).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.ops import pallas_composite as pc
from pcp_tpu.ops.projection import CameraIntrin
from pcp_tpu.ops.rasterize import rasterize

W, H = 64, 48
INTRIN = CameraIntrin(
    fx=jnp.float32(40.0), fy=jnp.float32(40.0),
    cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
)
BG = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)


@pytest.fixture(autouse=True)
def _interpret():
    pc.INTERPRET = True
    yield
    pc.INTERPRET = False


def _scene(rng, n, deg=0):
    k = (deg + 1) ** 2
    xyz = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(2, 6, n)], -1,
    ).astype(np.float32)
    return (
        jnp.asarray(xyz),
        jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.95, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-0.3, 0.8, (n, k, 3)).astype(np.float32)),
        jnp.eye(4),
    )


@pytest.mark.parametrize("n", [25, 150])
def test_fused_matches_xla_forward(rng, n):
    args = _scene(rng, n)
    kw = dict(max_per_tile=128, max_pairs=1 << 14)
    img_x, aux_x = rasterize(*args, INTRIN, (W, H), BG, 0, use_pallas=False, **kw)
    img_p, aux_p = rasterize(*args, INTRIN, (W, H), BG, 0, use_pallas=True, **kw)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(aux_p["final_t"]), np.asarray(aux_x["final_t"]), atol=3e-5
    )


def test_fused_matches_xla_gradients(rng):
    xyz, scales, quats, opac, sh, viewmat = _scene(rng, 40)
    gt = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))

    def loss(use_pallas, xyz, scales, opac, sh):
        img, _ = rasterize(
            xyz, scales, quats, opac, sh, viewmat, INTRIN, (W, H), BG, 0,
            max_per_tile=128, max_pairs=1 << 14, use_pallas=use_pallas,
        )
        return jnp.mean((img - gt) ** 2)

    gx = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2, 3))(
        xyz, scales, opac, sh
    )
    gp = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2, 3))(
        xyz, scales, opac, sh
    )
    for a, b, name in zip(gx, gp, ("xyz", "scales", "opac", "sh")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-5, err_msg=name
        )


def test_fused_means2d_probe(rng):
    xyz, scales, quats, opac, sh, viewmat = _scene(rng, 16)
    probe = jnp.zeros((16, 2))

    def loss(p):
        img, _ = rasterize(
            xyz, scales, quats, opac, sh, viewmat, INTRIN, (W, H), BG, 0,
            means2d_offset=p, use_pallas=True, max_per_tile=64,
            max_pairs=1 << 12,
        )
        return jnp.sum(img)

    g = jax.grad(loss)(probe)
    assert float(jnp.abs(g).sum()) > 0.0


def test_fused_matches_xla_multiblock(rng):
    # >= 3 tile blocks and >= 2 slot chunks: catches block-index-map errors
    # that clamping hides on small grids.
    w, h = 112, 80
    intrin = CameraIntrin(
        fx=jnp.float32(70.0), fy=jnp.float32(70.0),
        cx=jnp.float32(w / 2), cy=jnp.float32(h / 2),
    )
    n = 300
    xyz = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(2, 6, n)], -1,
    ).astype(np.float32)
    args = (
        jnp.asarray(xyz),
        jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.95, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-0.3, 0.8, (n, 1, 3)).astype(np.float32)),
        jnp.eye(4),
    )
    kw = dict(max_per_tile=256, max_pairs=1 << 15)
    img_x, _ = rasterize(*args, intrin, (w, h), BG, 0, use_pallas=False, **kw)
    img_p, _ = rasterize(*args, intrin, (w, h), BG, 0, use_pallas=True, **kw)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x), atol=3e-5)

    def loss(use_pallas, xyz):
        img, _ = rasterize(
            xyz, *args[1:], intrin, (w, h), BG, 0, use_pallas=use_pallas, **kw
        )
        return jnp.mean(img * img)

    gx = jax.grad(lambda a: loss(False, a))(args[0])
    gp = jax.grad(lambda a: loss(True, a))(args[0])
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=2e-3,
                               atol=2e-5)


def _skewed_scene(rng, n):
    """Half the splats cluster near the image center: strong tile-load
    skew, so a small k_lo forces several tiles into the hi class."""
    n_hot = n // 2
    xyz_hot = np.stack(
        [rng.uniform(-0.25, 0.25, n_hot), rng.uniform(-0.2, 0.2, n_hot),
         rng.uniform(2, 6, n_hot)], -1)
    xyz_cold = np.stack(
        [rng.uniform(-2, 2, n - n_hot), rng.uniform(-1.5, 1.5, n - n_hot),
         rng.uniform(2, 6, n - n_hot)], -1)
    xyz = np.concatenate([xyz_hot, xyz_cold]).astype(np.float32)
    return (
        jnp.asarray(xyz),
        jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.95, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-0.3, 0.8, (n, 1, 3)).astype(np.float32)),
        jnp.eye(4),
    )


def test_split_matches_xla_forward(rng):
    args = _skewed_scene(rng, 400)
    img_x, aux_x = rasterize(*args, INTRIN, (W, H), BG, 0, use_pallas=False,
                             max_per_tile=512, max_pairs=1 << 15)
    img_s, aux_s = rasterize(*args, INTRIN, (W, H), BG, 0, use_pallas=True,
                             max_per_tile=512, tile_k_lo=128, tile_hi_cap=8,
                             max_pairs=1 << 15)
    # the skew must actually exercise the hi table
    assert int(aux_s["max_tile_load"]) > 128
    assert int(aux_s["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_x),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(aux_s["final_t"]),
                               np.asarray(aux_x["final_t"]), atol=3e-5)


def test_split_matches_xla_gradients(rng):
    xyz, scales, quats, opac, sh, viewmat = _skewed_scene(rng, 300)
    gt = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))

    def loss(split, xyz, scales, opac, sh):
        kw = (dict(tile_k_lo=128, tile_hi_cap=8, use_pallas=True)
              if split else dict(use_pallas=False))
        img, _ = rasterize(
            xyz, scales, quats, opac, sh, viewmat, INTRIN, (W, H), BG, 0,
            max_per_tile=512, max_pairs=1 << 15, **kw,
        )
        return jnp.mean((img - gt) ** 2)

    gx = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2, 3))(
        xyz, scales, opac, sh)
    gs = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2, 3))(
        xyz, scales, opac, sh)
    for a, b, name in zip(gx, gs, ("xyz", "scales", "opac", "sh")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-5, err_msg=name
        )


def test_split_hi_overflow_degrades_gracefully(rng):
    # more hi-class tiles than t_hi: overflow tiles stay in the lo table
    # truncated to k_lo (nearest-k), drops counted, output finite.
    args = _skewed_scene(rng, 400)
    img, aux = rasterize(*args, INTRIN, (W, H), BG, 0, use_pallas=True,
                         max_per_tile=512, tile_k_lo=128, tile_hi_cap=1,
                         max_pairs=1 << 15)
    assert bool(jnp.all(jnp.isfinite(img)))
    assert int(aux["n_dropped"]) > 0


def test_autosize_tile_classes_skew():
    from pcp_tpu.ops.binning import autosize_tile_classes

    # 100 synthetic rects: 90 small spread out + 10 stacked on one tile
    rng = np.random.default_rng(0)
    tx, ty = 16, 12
    small = np.stack([
        rng.integers(0, tx - 1, 600), rng.integers(0, ty - 1, 600)], -1)
    rect_small = np.concatenate([small, small + 1], 1)
    rect_big = np.tile(np.array([[4, 4, 9, 9]]), (900, 1))
    rect = np.concatenate([rect_small, rect_big]).astype(np.int32)
    k_lo, k_hi, t_hi = autosize_tile_classes([(rect, tx, ty)])
    assert k_hi >= 900
    assert t_hi > 0 and t_hi % 8 == 0
    assert k_lo < k_hi

    # near-uniform loads: no split
    k_lo2, k_hi2, t_hi2 = autosize_tile_classes([(rect_small, tx, ty)])
    assert t_hi2 == 0


def test_levels_matches_xla(rng):
    # three-level geometry on a broad load distribution
    args = _skewed_scene(rng, 500)
    img_x, aux_x = rasterize(*args, INTRIN, (W, H), BG, 0, use_pallas=False,
                             max_per_tile=1024, max_pairs=1 << 15)
    img_l, aux_l = rasterize(
        *args, INTRIN, (W, H), BG, 0, use_pallas=True,
        max_per_tile=1024, tile_k_lo=128,
        tile_levels=((256, 8), (1024, 8)), max_pairs=1 << 15)
    assert int(aux_l["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(img_l), np.asarray(img_x),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(aux_l["final_t"]),
                               np.asarray(aux_x["final_t"]), atol=3e-5)

    def loss(use_levels, xyz):
        kw = (dict(tile_k_lo=128, tile_levels=((256, 8), (1024, 8)),
                   use_pallas=True)
              if use_levels else dict(use_pallas=False))
        img, _ = rasterize(xyz, *args[1:], INTRIN, (W, H), BG, 0,
                           max_per_tile=1024, max_pairs=1 << 15, **kw)
        return jnp.mean(img * img)

    gx = jax.grad(lambda a: loss(False, a))(args[0])
    gl = jax.grad(lambda a: loss(True, a))(args[0])
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gx), rtol=2e-3,
                               atol=2e-5)


def test_choose_tile_levels_broad():
    from pcp_tpu.ops.binning import choose_tile_levels

    rng = np.random.default_rng(3)
    nt = 4000
    # broad distribution like the real block: loads spread 100..2600
    loads = rng.integers(100, 2600, (4, nt))
    k0, levels = choose_tile_levels(loads, nt)
    assert k0 == 256
    ks = [k for k, _ in levels]
    assert ks == sorted(ks) and ks[-1] >= 2600 * 1.3
    assert all(t % 8 == 0 and t > 0 for _, t in levels)
    # uniform loads are the adversarial case for leveling: the doubling
    # pad alone costs ~1.33x the mean floor — still clearly under single
    total = nt * k0 + sum(k * t for k, t in levels)
    assert total < 0.9 * nt * ks[-1]

    # decaying tail (the converged-scene shape): leveling wins big
    tail = np.minimum((rng.pareto(2.0, (4, nt)) * 150 + 60), 2600
                      ).astype(int)
    k0_t, levels_t = choose_tile_levels(tail, nt)
    total_t = nt * k0_t + sum(k * t for k, t in levels_t)
    k_top_t = levels_t[-1][0] if levels_t else k0_t
    assert total_t < 0.2 * nt * k_top_t

    # narrow distribution: single table
    k0_n, levels_n = choose_tile_levels(
        np.full((2, nt), 300), nt)
    assert levels_n == () and k0_n >= 300
