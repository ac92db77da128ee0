"""Dense O(N * pixels) reference rasterizer for testing.

Replays the CUDA per-pixel compositing loop (forward.cu:261-374) literally in
numpy: global depth sort, sequential front-to-back alpha blending with the
exact skip/early-stop rules, restricted — like the tiled renderer — to pixels
whose tile is inside the Gaussian's tile rect. Slow by construction; used only
by tests as ground truth for ops/rasterize.py.
"""

from __future__ import annotations

import numpy as np

from pcp_tpu.ops.projection import TILE, preprocess
from pcp_tpu.ops.rasterize import ALPHA_MAX, ALPHA_MIN, T_EPS


def rasterize_dense(
    xyz, scales, quats, opacities, sh, viewmat, intrin, image_size,
    background, sh_degree,
):
    """Returns (image (H, W, 3), final_T (H, W)) as float32 numpy."""
    import jax.numpy as jnp

    prep = preprocess(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opacities), jnp.asarray(sh), jnp.asarray(viewmat),
        intrin, image_size, sh_degree,
    )
    means2d = np.asarray(prep["means2d"])
    conics = np.asarray(prep["conics"])
    rgb = np.asarray(prep["rgb"])
    opac = np.asarray(prep["opacity"])
    rect = np.asarray(prep["rect"])
    depths = np.asarray(prep["depths"])
    visible = np.asarray(prep["visible"])

    w, h = int(image_size[0]), int(image_size[1])
    order = np.argsort(np.where(visible, depths, np.inf), kind="stable")

    img = np.zeros((h, w, 3), np.float32)
    final_t = np.ones((h, w), np.float32)
    bg = np.asarray(background, np.float32).reshape(3)

    for py in range(h):
        for px in range(w):
            t = 1.0
            c = np.zeros(3, np.float32)
            tx, ty = px // TILE, py // TILE
            for g in order:
                if not visible[g]:
                    break
                x0, y0, x1, y1 = rect[g]
                if not (x0 <= tx < x1 and y0 <= ty < y1):
                    continue
                dx = px - means2d[g, 0]
                dy = py - means2d[g, 1]
                a, b, cc = conics[g]
                power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
                if power > 0.0:
                    continue
                alpha = min(ALPHA_MAX, opac[g] * np.exp(power))
                if alpha < ALPHA_MIN:
                    continue
                t_after = t * (1.0 - alpha)
                if t_after < T_EPS:
                    break
                c += rgb[g] * alpha * t
                t = t_after
            img[py, px] = c + t * bg
            final_t[py, px] = t
    return img, final_t


def rasterize_dense_jax(
    xyz, scales, quats, opacities, sh, viewmat, intrin, image_size,
    background, sh_degree, *, chunk=64, pix_batch=4096,
):
    """Vectorized dense oracle: same semantics as :func:`rasterize_dense`
    (global depth order, per-pixel tile-rect restriction, the exact CUDA
    skip/early-stop rules, forward.cu:261-374) but expressed as a
    `lax.scan` over depth-ordered Gaussian chunks x pixel batches, so a
    multi-million-Gaussian ground-truth render finishes in minutes on a
    chip instead of days in the Python loop. NO binning, NO tile tables,
    NO Pallas — deliberately independent of the production composite
    path so quality artifacts can score renders against GT that the
    production kernel never touched (round-5 item 5). Validated against
    rasterize_dense on small scenes (tests/test_oracle_jax.py).

    Returns (image (H, W, 3), final_T (H, W)) as float32 numpy.
    """
    import jax
    import jax.numpy as jnp

    prep = preprocess(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opacities), jnp.asarray(sh), jnp.asarray(viewmat),
        intrin, image_size, sh_degree,
    )
    w, h = int(image_size[0]), int(image_size[1])
    n = prep["means2d"].shape[0]
    nc = ((n + chunk - 1) // chunk) * chunk

    order = jnp.argsort(
        jnp.where(prep["visible"], prep["depths"], jnp.inf), stable=True)

    def by_depth(x, fill=0.0):
        x = jnp.take(x, order, axis=0)
        pad = [(0, nc - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    mean = by_depth(prep["means2d"])                    # (nc, 2)
    conic = by_depth(prep["conics"])                    # (nc, 3)
    rgbv = by_depth(prep["rgb"])                        # (nc, 3)
    opac = by_depth(
        jnp.where(prep["visible"], prep["opacity"], 0.0))
    rect = by_depth(prep["rect"].astype(jnp.int32))     # (nc, 4)

    npix = h * w
    npb = ((npix + pix_batch - 1) // pix_batch) * pix_batch
    pys, pxs = jnp.divmod(jnp.arange(npb, dtype=jnp.int32), w)
    bg = jnp.asarray(background, jnp.float32).reshape(3)

    mean_c = mean.reshape(nc // chunk, chunk, 2)
    conic_c = conic.reshape(nc // chunk, chunk, 3)
    rgb_c = rgbv.reshape(nc // chunk, chunk, 3)
    opac_c = opac.reshape(nc // chunk, chunk)
    rect_c = rect.reshape(nc // chunk, chunk, 4)

    def render_batch(pix):
        px, py = pix                                   # (B,), (B,)
        tx = px // TILE
        ty = py // TILE

        def scan_body(carry, ch):
            color, trans, done = carry
            m, cn, rg, op, rc = ch
            dx = px[None, :].astype(jnp.float32) - m[:, 0:1]   # (CH, B)
            dy = py[None, :].astype(jnp.float32) - m[:, 1:2]
            a, b, c = cn[:, 0:1], cn[:, 1:2], cn[:, 2:3]
            power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op[:, None] * jnp.exp(power))
            in_rect = ((rc[:, 0:1] <= tx[None, :]) & (tx[None, :] < rc[:, 2:3])
                       & (rc[:, 1:2] <= ty[None, :]) & (ty[None, :] < rc[:, 3:4]))
            alpha = jnp.where(
                (power > 0.0) | (alpha < ALPHA_MIN) | ~in_rect, 0.0, alpha)
            # sticky early-stop BEFORE the offending contribution
            log1ma = jnp.log1p(-alpha)
            t_after = trans[None, :] * jnp.exp(jnp.cumsum(log1ma, axis=0))
            done_k = done[None, :] | (
                jnp.cumsum(t_after < T_EPS, axis=0) > 0)
            alpha = jnp.where(done_k, 0.0, alpha)
            log1ma = jnp.log1p(-alpha)
            cum = jnp.cumsum(log1ma, axis=0)
            t_excl = trans[None, :] * jnp.exp(cum - log1ma)
            wgt = alpha * t_excl                               # (CH, B)
            color = color + jnp.einsum(
                "kp,kc->pc", wgt, rg,
                precision=jax.lax.Precision.HIGHEST)
            trans = trans * jnp.exp(cum[-1, :])
            done = done_k[-1, :]
            return (jax.lax.stop_gradient(color),
                    jax.lax.stop_gradient(trans),
                    done), None

        init = (jnp.zeros((pix_batch, 3), jnp.float32),
                jnp.ones((pix_batch,), jnp.float32),
                jnp.zeros((pix_batch,), bool))
        (color, trans, _), _ = jax.lax.scan(
            scan_body, init, (mean_c, conic_c, rgb_c, opac_c, rect_c))
        return color + trans[:, None] * bg[None, :], trans

    pxs_b = pxs.reshape(npb // pix_batch, pix_batch)
    pys_b = pys.reshape(npb // pix_batch, pix_batch)
    color, trans = jax.lax.map(render_batch, (pxs_b, pys_b))
    img = color.reshape(npb, 3)[:npix].reshape(h, w, 3)
    tfin = trans.reshape(npb)[:npix].reshape(h, w)
    return np.asarray(img), np.asarray(tfin)
