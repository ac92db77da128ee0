"""Intra-block parallelism: one huge block sharded across the mesh.

Extension beyond reference behaviour (SURVEY §2.4 flags it as such): the
reference's only answer to "block bigger than one device" is a smaller
partition threshold. Here a single block's Gaussian axis shards over a
("gauss",) mesh so its parameters, optimizer moments, and preprocess
compute split D ways — the memory ceiling becomes the slice's aggregate
HBM, not one chip's:

  forward: preprocess runs shard-local on N/D Gaussians -> per-Gaussian
  screen-space attributes all_gather over ICI (~40 B/Gaussian, bandwidth-
  trivial next to rasterization) -> every device bins + composites its own
  horizontal band of tiles (image rows shard the rasterization work; the
  depth-ordered blend stays exact because each band sees the full, globally
  depth-sorted Gaussian set).

  backward (automatic through shard_map): the all_gather transposes to a
  reduce-scatter of activation gradients; parameter gradients land sharded,
  so Adam also runs shard-local — ZeRO-style, no replicated state anywhere.

Losses: L1 is a psum of band-local sums; SSIM needs an 11-pixel halo, so
bands all_gather the (small) rendered image and compute it redundantly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcp_tpu.models import gaussians as G
from pcp_tpu.ops.binning import bin_gaussians
from pcp_tpu.ops.projection import TILE, CameraIntrin, preprocess
from pcp_tpu.ops.rasterize import composite
from pcp_tpu.train import optim
from pcp_tpu.train.config import OptimConfig
from pcp_tpu.train.step import gaussian_lrs
from pcp_tpu.utils.loss import l1_loss, ssim


def gauss_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("gauss",))


def shard_params(params, alive, mesh: Mesh):
    """Place capacity-padded Gaussian arrays with the N axis sharded."""
    sharding = NamedSharding(mesh, P("gauss"))
    put = lambda x: jax.device_put(x, sharding)
    return jax.tree_util.tree_map(put, params), put(alive)


def _band(image_size, d, idx):
    """Tile-row band [row0, row1) of device idx among d."""
    w, h = image_size
    tiles_y = (h + TILE - 1) // TILE
    rows = (tiles_y + d - 1) // d
    return rows


def make_sharded_render(
    mesh: Mesh,
    image_size,
    sh_degree: int,
    *,
    max_per_tile: int = 512,
    pairs_per_gaussian: int = 16,
):
    """render(params_sharded, alive_sharded, viewmat, intrin, background)
    -> full (H, W, 3) image (replicated)."""
    w, h = int(image_size[0]), int(image_size[1])
    d = mesh.devices.size
    tiles_x = (w + TILE - 1) // TILE
    tiles_y = (h + TILE - 1) // TILE
    band_rows = (tiles_y + d - 1) // d
    band_h = band_rows * TILE

    def local(params, alive, viewmat, intrin, background):
        # --- shard-local preprocess over N/D Gaussians ---
        opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
        prep = preprocess(
            params["xyz"], G.scaling_act(params["scaling"]),
            params["rotation"], opac, G.sh_coeffs(params), viewmat, intrin,
            (w, h), sh_degree,
        )
        # --- all_gather screen-space attributes (the "activation gather") ---
        gathered = {
            k: jax.lax.all_gather(prep[k], "gauss", tiled=True)
            for k in ("means2d", "depths", "conics", "rgb", "opacity", "rect")
        }
        n_total = gathered["depths"].shape[0]

        # --- my band: clamp rects to my tile rows, bin, composite ---
        me = jax.lax.axis_index("gauss")
        r0 = me * band_rows
        rect = gathered["rect"]
        y0 = jnp.clip(rect[:, 1] - r0, 0, band_rows)
        y1 = jnp.clip(rect[:, 3] - r0, 0, band_rows)
        band_rect = jnp.stack([rect[:, 0], y0, rect[:, 2], y1], axis=1)
        bins = bin_gaussians(
            band_rect, gathered["depths"], tiles_x, band_rows,
            max_pairs=pairs_per_gaussian * n_total // d,
            max_per_tile=max_per_tile,
        )
        # composite works in band-local pixel coords: shift means2d.y
        band_prep = dict(gathered)
        band_prep["means2d"] = gathered["means2d"] - jnp.stack(
            [jnp.zeros((), jnp.float32), (r0 * TILE).astype(jnp.float32)]
        )
        band, _ = composite(band_prep, bins, (w, band_h), background)
        # --- assemble the full image (bands are disjoint rows) ---
        return band[None]  # (1, band_h, w, 3); out_specs concatenates

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("gauss"), P("gauss"), P(), P(), P()),
        out_specs=P("gauss"),
        check_vma=False,
    )

    def render(params, alive, viewmat, intrin, background):
        bands = f(params, alive, viewmat, intrin, background)
        img = bands.reshape(d * band_h, w, 3)
        return img[:h]

    return render


def make_sharded_train_step(
    mesh: Mesh,
    ocfg: OptimConfig,
    image_size,
    *,
    max_per_tile: int = 512,
):
    """Jitted ZeRO-style step for one sharded block (no appearance net;
    L1 + D-SSIM loss on the assembled image). sh_degree static."""
    w, h = int(image_size[0]), int(image_size[1])
    render_cache = {}

    def get_render(sh_degree):
        if sh_degree not in render_cache:
            render_cache[sh_degree] = make_sharded_render(
                mesh, (w, h), sh_degree, max_per_tile=max_per_tile,
                pairs_per_gaussian=ocfg.pairs_per_gaussian,
            )
        return render_cache[sh_degree]

    @functools.partial(jax.jit, static_argnames=("sh_degree",), donate_argnums=(0, 1))
    def step(params, opt_g, alive, viewmat, intrin, gt, background, extent,
             sh_degree):
        render = get_render(sh_degree)

        def loss_fn(p):
            img = render(p, alive, viewmat, intrin, background)
            chw = lambda x: jnp.transpose(x, (2, 0, 1))
            return (1.0 - ocfg.lambda_dssim) * l1_loss(img, gt) + (
                ocfg.lambda_dssim
            ) * (1.0 - ssim(chw(img), chw(gt)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        lrs = gaussian_lrs(ocfg, extent)
        params, opt_g = optim.adam_step(params, grads, opt_g, lrs)
        return params, opt_g, loss

    return step
