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
