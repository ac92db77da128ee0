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


def balance_for_sharding(params, alive, d: int):
    """Permute the capacity axis so alive Gaussians (and therefore free
    slots) spread evenly over a d-way shard of that axis.

    Shard-local densify (make_sharded_densify) clones/splits into free
    slots ON THE SAME SHARD; a freshly loaded block packs its alive
    Gaussians into the low slots, which would leave the first shards full
    (clones dropped) and the last shards empty (nothing to clone).
    Compositing is order-invariant (depth sort happens in binning), so a
    one-time host-side permutation is free."""
    alive_np = np.asarray(alive)
    c = alive_np.shape[0]
    per = c // d
    assert per * d == c, f"capacity {c} must divide the {d}-way mesh"
    a_idx = np.flatnonzero(alive_np)
    dead_q = np.flatnonzero(~alive_np)
    buckets = [list(a_idx[s::d]) for s in range(d)]
    perm, di = [], 0
    for s in range(d):
        need = per - len(buckets[s])
        assert need >= 0
        buckets[s].extend(dead_q[di:di + need])
        di += need
        perm.extend(buckets[s])
    perm = np.asarray(perm, dtype=np.int64)
    take = lambda x: np.asarray(x)[perm] if np.ndim(x) >= 1 else x
    return (jax.tree_util.tree_map(take, params), take(alive_np))


def shard_tree(tree, mesh: Mesh):
    """device_put a pytree with rank>=1 leaves N-axis sharded and scalar
    leaves (e.g. the Adam step counter) replicated."""
    sh_g = NamedSharding(mesh, P("gauss"))
    sh_r = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh_g if jnp.ndim(x) >= 1 else sh_r), tree)


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
    with_aux: bool = False,
):
    """render(params_sharded, alive_sharded, viewmat, intrin, background
    [, probe]) -> full (H, W, 3) image (replicated).

    ``with_aux=True`` additionally threads a sharded (C, 2) ``probe``
    (the means2d densify-gradient probe, train/step.py) through the
    shard-local preprocess and returns (img, radii, visible) with the
    per-Gaussian aux arrays sharded like the params."""
    w, h = int(image_size[0]), int(image_size[1])
    d = mesh.devices.size
    tiles_x = (w + TILE - 1) // TILE
    tiles_y = (h + TILE - 1) // TILE
    band_rows = (tiles_y + d - 1) // d
    band_h = band_rows * TILE

    def local(params, alive, viewmat, intrin, background, probe):
        # --- shard-local preprocess over N/D Gaussians ---
        opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(jnp.float32)
        prep = preprocess(
            params["xyz"], G.scaling_act(params["scaling"]),
            params["rotation"], opac, G.sh_coeffs(params), viewmat, intrin,
            (w, h), sh_degree, means2d_offset=probe,
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
        # per-band binning stats (saturation/overflow observability for the
        # sharded trainer's re-tuner; out_specs stacks them to (d, 2))
        binstats = jnp.stack([bins.max_tile_load, bins.n_dropped])[None]
        # --- assemble the full image (bands are disjoint rows) ---
        # (1, band_h, w, 3); out_specs concatenates. aux stays shard-local.
        return band[None], prep["radii"], prep["visible"], binstats

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("gauss"), P("gauss"), P(), P(), P(), P("gauss")),
        out_specs=(P("gauss"), P("gauss"), P("gauss"), P("gauss")),
        check_vma=False,
    )

    def render(params, alive, viewmat, intrin, background, probe=None):
        if probe is None:
            probe = jnp.zeros_like(params["xyz"][:, :2])
        bands, radii, visible, binstats = f(params, alive, viewmat, intrin,
                                            background, probe)
        img = bands.reshape(d * band_h, w, 3)[:h]
        if with_aux:
            return img, radii, visible, binstats
        return img

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


# ---------------------------------------------------------------------------
# Full intra-block TRAINER: appearance net + densify/prune + opacity reset
# under Gaussian-axis sharding. The appearance net is replicated (it is a
# few MB); Gaussian params, Adam moments, densify stats, and the densify
# transform itself are all shard-local (each shard manages its capacity/D
# slot pool independently — clone/split targets free slots on the same
# shard, so there is no cross-shard migration traffic).
# ---------------------------------------------------------------------------

from pcp_tpu.train.step import TrainState, appearance_lrs, densify_impl


def make_sharded_train_step_full(
    mesh: Mesh,
    ocfg: OptimConfig,
    image_size,
    *,
    use_appearance: bool = True,
):
    """Jitted full step on a sharded block: render (Gaussian-axis sharded
    preprocess + tile-band composite) -> appearance decouple -> L1+D-SSIM ->
    Adam on both param sets -> densify-stat accumulation (train.py:94-157
    parity at intra-block scale)."""
    from pcp_tpu.models.appearance import decouple_appearance

    w, h = int(image_size[0]), int(image_size[1])
    render_cache = {}

    def get_render(sh_degree):
        if sh_degree not in render_cache:
            render_cache[sh_degree] = make_sharded_render(
                mesh, (w, h), sh_degree, max_per_tile=ocfg.max_per_tile,
                pairs_per_gaussian=ocfg.pairs_per_gaussian, with_aux=True,
            )
        return render_cache[sh_degree]

    @functools.partial(jax.jit, static_argnames=("sh_degree",),
                       donate_argnums=(0,))
    def step(state: TrainState, viewmat, intrin, gt, view_idx, background,
             extent, sh_degree):
        render = get_render(sh_degree)
        probe0 = jnp.zeros_like(state.params["xyz"][:, :2])

        def loss_fn(params, app, probe):
            img, radii, visible, binstats = render(
                params, state.alive, viewmat, intrin, background, probe)
            if use_appearance and app is not None:
                decoupled, _ = decouple_appearance(img, app, view_idx)
            else:
                decoupled = img
            chw = lambda x: jnp.transpose(x, (2, 0, 1))
            loss = (1.0 - ocfg.lambda_dssim) * l1_loss(decoupled, gt) + (
                ocfg.lambda_dssim
            ) * (1.0 - ssim(chw(img), chw(gt)))
            return loss, (radii, visible, binstats)

        (loss, (radii, visible, binstats)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.params, state.app, probe0)
        g_gauss, g_app, g_probe = grads

        gnorm = jnp.linalg.norm(
            g_probe * jnp.asarray([0.5 * w, 0.5 * h]), axis=-1)
        vis = visible & state.alive
        stats = {
            "grad_accum": state.stats["grad_accum"] + jnp.where(vis, gnorm, 0.0),
            "denom": state.stats["denom"] + vis.astype(jnp.float32),
            "max_radii2d": jnp.maximum(
                state.stats["max_radii2d"], jnp.where(vis, radii, 0.0)),
        }
        dead = ~state.alive
        g_gauss = jax.tree_util.tree_map(
            lambda g: jnp.where(
                dead.reshape((-1,) + (1,) * (g.ndim - 1)), 0.0, g),
            g_gauss,
        )
        params, opt_g = optim.adam_step(
            state.params, g_gauss, state.opt_g, gaussian_lrs(ocfg, extent))
        if use_appearance and state.app is not None:
            app, opt_a = optim.adam_step(
                state.app, g_app, state.opt_a, appearance_lrs(ocfg))
        else:
            app, opt_a = state.app, state.opt_a
        new_state = TrainState(params, app, opt_g, opt_a, state.alive, stats)
        return new_state, {
            "loss": loss,
            "n_visible": jnp.sum(vis),
            # binstats (d, 2): per-band [max_tile_load, n_dropped]
            "max_tile_load": jnp.max(binstats[:, 0]),
            "n_dropped": jnp.sum(binstats[:, 1]),
        }

    return step


def make_sharded_loads(mesh: Mesh, image_size):
    """Per-band tile-load measurement on the SHARDED state (the intra-block
    analog of train/loop._sample_loads): shard-local preprocess,
    all_gather rects, clamp to my tile band, exact per-tile counts. Only
    (d, band_tiles) ints leave the device — the re-tuner sizes
    max_per_tile from their max. Rects depend on geometry only, so SH
    degree 0 is used."""
    from pcp_tpu.ops.binning import tile_loads_device

    w, h = int(image_size[0]), int(image_size[1])
    d = mesh.devices.size
    tiles_x = (w + TILE - 1) // TILE
    tiles_y = (h + TILE - 1) // TILE
    band_rows = (tiles_y + d - 1) // d

    def local(params, alive, viewmat, intrin):
        opac = G.opacity_act(params["opacity"])[:, 0] * alive.astype(
            jnp.float32)
        prep = preprocess(
            params["xyz"], G.scaling_act(params["scaling"]),
            params["rotation"], opac, G.sh_coeffs(params), viewmat, intrin,
            (w, h), 0,
        )
        rect = jax.lax.all_gather(prep["rect"], "gauss", tiled=True)
        me = jax.lax.axis_index("gauss")
        r0 = me * band_rows
        y0 = jnp.clip(rect[:, 1] - r0, 0, band_rows)
        y1 = jnp.clip(rect[:, 3] - r0, 0, band_rows)
        band_rect = jnp.stack([rect[:, 0], y0, rect[:, 2], y1], axis=1)
        return tile_loads_device(band_rect, tiles_x, band_rows)[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("gauss"), P("gauss"), P(), P()),
        out_specs=P("gauss"),
        check_vma=False,
    )
    return jax.jit(f)


def make_sharded_densify(mesh: Mesh, ocfg: OptimConfig):
    """Shard-local densify/prune (+ Adam moment surgery): every shard runs
    densify_impl on its capacity/D slice with a per-shard RNG fold — the
    explicit alternative to gather-densify-reshard, with zero collectives."""
    spec_g = P("gauss")

    def local(params, opt_g, alive, stats, key, extent, prune_big):
        key = jax.random.fold_in(key, jax.lax.axis_index("gauss"))
        st = TrainState(params, None, opt_g, None, alive, stats)
        out = densify_impl(st, key, extent, ocfg=ocfg, prune_big=prune_big)
        return out.params, out.opt_g, out.alive, out.stats

    def _spec_of(tree):
        # scalar leaves (the Adam step counter) stay replicated
        return jax.tree_util.tree_map(
            lambda x: spec_g if jnp.ndim(x) >= 1 else P(), tree)

    @functools.partial(jax.jit, static_argnames=("prune_big",),
                       donate_argnums=(0,))
    def densify(state: TrainState, key, extent, prune_big: bool):
        f = shard_map(
            functools.partial(local, prune_big=prune_big),
            mesh=mesh,
            in_specs=(_spec_of(state.params), _spec_of(state.opt_g),
                      spec_g, _spec_of(state.stats), P(), P()),
            out_specs=(_spec_of(state.params), _spec_of(state.opt_g),
                       spec_g, _spec_of(state.stats)),
            check_vma=False,
        )
        params, opt_g, alive, stats = f(
            state.params, state.opt_g, state.alive, state.stats, key, extent)
        return TrainState(params, state.app, opt_g, state.opt_a, alive, stats)

    return densify


def train_scene_sharded(
    scene,
    cfg,
    mesh: Mesh,
    *,
    save_name: str = "point_cloud",
    log_fn=print,
    checkpoint_every: int = 2000,
    resume: bool = True,
) -> TrainState:
    """Train ONE oversized block sharded over ``mesh`` with the reference
    cadence (densify window/interval, opacity reset, SH warm-up) — the
    auto_train --intra_block path for blocks that exceed a chip's HBM
    (README.md:90-99 threshold<->VRAM table; this removes the need to
    shrink the partition threshold).

    Durability parity with the fleet path: a ROLLING checkpoint
    (``chkpnt_sharded.npz`` every ``checkpoint_every`` iters, written
    atomically; resumed on re-entry when ``resume``), TB/JSONL scalars via
    TrainLogger, and held-out-view L1/PSNR at ``cfg.test_iterations``
    rendered through the SHARDED renderer (an oversized block never has to
    fit one device, even for eval). Reference: train.py:160-162 full
    checkpoints, training_report:188-243."""
    import os
    import random as _random

    from pcp_tpu.scene import cameras as cam_mod
    from pcp_tpu.scene.dataset import split_train_test
    from pcp_tpu.train import checkpoint as ckpt
    from pcp_tpu.train.loop import init_state, save_model
    from pcp_tpu.train.logging import TrainLogger
    from pcp_tpu.train.step import opacity_reset_impl
    from pcp_tpu.utils.image import psnr as psnr_fn

    d = mesh.devices.size
    ocfg = cfg.optim
    assert ocfg.capacity % d == 0, (
        f"capacity {ocfg.capacity} must divide the {d}-way gauss mesh")
    model_path = cfg.model.model_path
    os.makedirs(model_path, exist_ok=True)
    ckpt_path = os.path.join(model_path, "chkpnt_sharded.npz")

    train_infos, test_infos = split_train_test(
        scene.cameras, cfg.model.eval, cfg.model.llffhold,
        explicit_test=getattr(scene, "test_camera_uids", None),
    )
    cams = [cam_mod.from_info(i, cfg.model.resolution) for i in train_infos]
    sizes = sorted({(c.width, c.height) for c in cams})
    assert len(sizes) == 1, "intra-block path: one camera resolution per block"
    w, h = sizes[0]
    test_cams = [c for c in (cam_mod.from_info(i, cfg.model.resolution)
                             for i in test_infos)
                 if (c.width, c.height) == (w, h)]

    key = jax.random.PRNGKey(cfg.seed)
    key, k0 = jax.random.split(key)
    host_template = init_state(scene, cfg, (w, h), k0)
    start_iter = 0
    if resume and os.path.exists(ckpt_path):
        # the checkpoint was saved post-balancing: shard directly, no
        # re-permutation (Adam moments/stats must stay aligned with params)
        host_state, start_iter = ckpt.load(ckpt_path, host_template)
        bal_params, bal_alive = host_state.params, host_state.alive
        opt_g_h, stats_h = host_state.opt_g, host_state.stats
        app_h, opt_a_h = host_state.app, host_state.opt_a
        key = jax.random.fold_in(key, start_iter)
        if log_fn:
            log_fn(f"[sharded x{d}] resumed {ckpt_path} @ iter {start_iter}")
    else:
        bal_params, bal_alive = balance_for_sharding(
            host_template.params, host_template.alive, d)
        opt_g_h, stats_h = host_template.opt_g, host_template.stats
        app_h, opt_a_h = host_template.app, host_template.opt_a
    p_sh, a_sh = shard_params(bal_params, bal_alive, mesh)
    state = TrainState(
        params=p_sh,
        app=app_h,
        opt_g=shard_tree(opt_g_h, mesh),
        opt_a=opt_a_h,
        alive=a_sh,
        stats=shard_tree(stats_h, mesh),
    )

    # --- auto max_per_tile + in-training re-tune (--max_per_tile 0) ---
    # The sharded composite's cost scales with K like the single-block
    # path's; size it from measured band loads and re-measure on the same
    # cadence/reactive contract (see train/loop.py, ops/binning._cap_fit).
    import dataclasses as _dc

    auto_tiles = ocfg.max_per_tile == 0
    loads_fn = None

    def _autosize_k(tag, cur_state):
        nonlocal loads_fn
        from pcp_tpu.ops import pallas_composite as pc
        from pcp_tpu.ops.binning import _cap_fit

        if loads_fn is None:
            loads_fn = make_sharded_loads(mesh, (w, h))
        maxload = 0
        for cam_s in cams[:: max(1, len(cams) // 4)][:4]:
            vm_s, in_s = cam_mod.camera_device_arrays(cam_s)
            ld = loads_fn(cur_state.params, cur_state.alive, vm_s, in_s)
            maxload = max(maxload, int(np.asarray(ld).max()))
        chunk = pc.CH
        k = max(128, int(-(-1.6 * maxload // chunk)) * chunk)
        k = int(min(k, _cap_fit(maxload, 4096, chunk)))
        if log_fn:
            log_fn(f"[sharded x{d}] auto max_per_tile ({tag}) -> {k} "
                   f"(max band-tile load {maxload})")
        return k

    retune_at = set()
    force_retune = set()
    if auto_tiles:
        r0 = int(os.environ.get("PCP_RETUNE", "3000"))
        if r0 > 0:
            retune_at = {start_iter + 300, start_iter + 1000} | {
                i for i in range(0, ocfg.iterations + 1, r0)
                if i > start_iter
            }

    eval_render_cache = {}

    def _build(oc):
        eval_render_cache.clear()
        return (make_sharded_train_step_full(
                    mesh, oc, (w, h),
                    use_appearance=cfg.pipeline.use_appearance),
                make_sharded_densify(mesh, oc))

    if auto_tiles:
        pre_state = TrainState(params=p_sh, app=app_h, opt_g=None,
                               opt_a=None, alive=a_sh, stats=None)
        ocfg = _dc.replace(ocfg, max_per_tile=_autosize_k("init", pre_state))
    step, densify = _build(ocfg)
    reset = jax.jit(opacity_reset_impl, donate_argnums=(0,))

    def eval_tests(state, sh_degree):
        if sh_degree not in eval_render_cache:
            eval_render_cache[sh_degree] = make_sharded_render(
                mesh, (w, h), sh_degree, max_per_tile=ocfg.max_per_tile,
                pairs_per_gaussian=ocfg.pairs_per_gaussian)
        render = eval_render_cache[sh_degree]
        l1s, psnrs = [], []
        for cam in test_cams:
            vm, intr = cam_mod.camera_device_arrays(cam)
            img = jnp.clip(
                render(state.params, state.alive, vm, intr, background),
                0.0, 1.0)
            gt = jnp.asarray(cam.gt_image)
            l1s.append(float(jnp.mean(jnp.abs(img - gt))))
            psnrs.append(float(psnr_fn(img[None], gt[None])[0]))
        return {"l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs))}

    logger = TrainLogger(model_path)
    background = jnp.asarray(
        [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0])
    rng = _random.Random(cfg.seed + start_iter)
    stack = []
    extent = jnp.float32(scene.extent)
    for it in range(start_iter + 1, ocfg.iterations + 1):
        if not stack:
            stack = list(range(len(cams)))
            rng.shuffle(stack)
        cam = cams[stack.pop()]
        sh_degree = min(cfg.model.sh_degree, (it - 1) // 1000)
        viewmat, intrin = cam_mod.camera_device_arrays(cam)
        state, metrics = step(
            state, viewmat, intrin, jnp.asarray(cam.gt_image),
            jnp.int32(cam.uid), background, extent, sh_degree,
        )
        # strict bounds, matching the reference cadence (train.py:140-152)
        if it < ocfg.densify_until_iter:
            if (it % ocfg.densification_interval == 0
                    and it > ocfg.densify_from_iter):
                key, dk = jax.random.split(key)
                state = densify(state, dk, extent,
                                it > ocfg.opacity_reset_interval)
            if it % ocfg.opacity_reset_interval == 0 or (
                cfg.model.white_background and it == ocfg.densify_from_iter
            ):
                state = reset(state)
        if it in retune_at:
            from pcp_tpu.train.loop import retune_decision

            k_new = _autosize_k(f"iter {it}", state)
            new_ocfg = _dc.replace(ocfg, max_per_tile=k_new)
            if retune_decision(ocfg, new_ocfg, ocfg.max_per_tile, k_new,
                               it in force_retune):
                ocfg = new_ocfg
                step, densify = _build(ocfg)
                if log_fn:
                    log_fn(f"[retune] sharded iter {it}: max_per_tile -> "
                           f"{k_new}; recompiling step")
        if it % 100 == 0 or it == 1:
            n_alive = int(np.asarray(state.alive).sum())
            logger.scalars(it, {
                "train_loss_patches/total_loss": float(metrics["loss"]),
                "total_points": n_alive,
            })
            if log_fn:
                log_fn(f"[sharded x{d}] iter {it:6d} "
                       f"loss {float(metrics['loss']):.5f} alive {n_alive}")
            if int(metrics.get("max_tile_load", 0)) > ocfg.max_per_tile:
                if log_fn:
                    log_fn(f"[warn] sharded iter {it}: per-tile saturation "
                           f"(densest band tile "
                           f"{int(metrics['max_tile_load'])} > max_per_tile="
                           f"{ocfg.max_per_tile})")
                if auto_tiles:
                    retune_at.add(it + 1)
                    force_retune.add(it + 1)
        if checkpoint_every and it % checkpoint_every == 0:
            tmp = ckpt_path[:-len(".npz")] + ".tmp.npz"  # keep npz backend
            ckpt.save(tmp, jax.device_get(state), it)
            os.replace(tmp, ckpt_path)
        if it in getattr(cfg, "test_iterations", ()) and test_cams:
            m = eval_tests(state, sh_degree)
            logger.scalars(it, {"test/loss_viewpoint_l1": m["l1"],
                                "test/loss_viewpoint_psnr": m["psnr"]})
            if log_fn:
                log_fn(f"[sharded x{d}] [eval {it}] test l1 {m['l1']:.4f} "
                       f"psnr {m['psnr']:.2f}")

    host = jax.device_get(state)
    save_model(host, model_path, ocfg.iterations, save_name)
    logger.close()
    return host
