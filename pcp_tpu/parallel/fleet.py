"""Block-parallel fleet training: all partitions at once over a device mesh.

Design (SURVEY §2.4, §7 step 7): each spatial block is an independent
training job with identical array shapes (capacity padding), so the fleet is
one stacked TrainState with a leading ``blocks`` axis, sharded over a 1-D
`jax.sharding.Mesh`. The per-block step body (train.step.train_step_impl) is
vmapped over the local blocks inside `shard_map`; XLA compiles a single SPMD
program, each chip running its blocks with zero inter-chip traffic in the
step (the reference's "communication" was the filesystem; ours is the mesh
dispatch + a final host gather for PLY export).

Blocks are padded to a multiple of the mesh size with inert dummies; their
outputs are dropped on unstack.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pcp_tpu.ops.projection import CameraIntrin
from pcp_tpu.train.config import OptimConfig
from pcp_tpu.train.step import (
    TrainState,
    densify_impl,
    opacity_reset_impl,
    train_step_impl,
)


class FleetState(NamedTuple):
    """TrainState with a leading blocks axis + per-block scalars."""

    state: TrainState          # every leaf: (B, ...)
    extents: jnp.ndarray       # (B,) spatial_lr_scale per block
    valid: jnp.ndarray         # (B,) bool — False for padding blocks


def block_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D ("blocks",) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("blocks",))


def stack_states(states: Sequence[TrainState]) -> TrainState:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *states)


def unstack_state(stacked: TrainState, i: int) -> TrainState:
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


def pad_blocks(
    states: List[TrainState], extents: List[float], n_shards: int
) -> FleetState:
    """Stack block states, padding to a multiple of the mesh size by
    repeating the last block (marked invalid)."""
    b = len(states)
    pad = (-b) % n_shards
    states = list(states) + [states[-1]] * pad
    extents = list(extents) + [extents[-1]] * pad
    valid = np.zeros(len(states), bool)
    valid[:b] = True
    return FleetState(
        state=stack_states(states),
        extents=jnp.asarray(extents, jnp.float32),
        valid=jnp.asarray(valid),
    )


def shard_fleet(fleet: FleetState, mesh: Mesh) -> FleetState:
    """Place the stacked pytree with the blocks axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P("blocks"))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, fleet)


def _shared_app_reduce(valid):
    """Cross-block appearance-gradient reduction for the shared-appearance
    fleet (round-4 verdict's designed fix for the multi-block radiance
    seams: /root/reference per-block processes train INDEPENDENT
    appearance nets — auto_train.py:22-51 + train.py:111-117 — whose
    effective exposures diverge and leave block-boundary seams after
    merge; replicating ONE appearance state across the fleet's block
    axes is impossible for the reference and natural here).

    Embedding rows are per-VIEW and each view belongs to exactly one
    block, so their grads PSUM (each row keeps its single contribution
    at single-model scale); the shared CNN's grads average over the
    valid blocks (batch-of-B semantics). Pad blocks (valid=False,
    duplicates of the last real block) are zero-weighted so they can't
    double-count."""
    v = valid.astype(jnp.float32)
    axes = ("lblocks", "blocks")

    def hook(g_app):
        nv = jax.lax.psum(v, axes)
        scaled = jax.tree_util.tree_map(lambda g: g * v, g_app)
        emb = jax.lax.psum(scaled["embeddings"], axes)
        net = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axes) / jnp.maximum(nv, 1.0),
            scaled["net"])
        return {"embeddings": emb, "net": net}

    return hook


def make_fleet_step(
    ocfg: OptimConfig,
    image_size,
    mesh: Mesh,
    *,
    use_appearance: bool = True,
    share_appearance: bool = False,
):
    """Compile the SPMD fleet step.

    Inputs per call: fleet (sharded), viewmats (B,4,4), intrins (B,4 stacked
    CameraIntrin), gts (B,H,W,3), view_idx (B,), background (3,), sh_degree
    (static). One XLA program; no collectives in the hot path — except
    ``share_appearance``, which adds one psum of the (small) appearance
    grads per step so every block applies identical appearance updates
    (see _shared_app_reduce; init must replicate one appearance state).
    """
    impl = functools.partial(
        train_step_impl,
        ocfg=ocfg,
        image_size=image_size,
        use_appearance=use_appearance,
    )

    def per_block(state, viewmat, intrin, gt, view_idx, background, extent,
                  valid_wh, valid, sh_degree):
        hook = (_shared_app_reduce(valid)
                if share_appearance and use_appearance else None)
        return impl(
            state, viewmat, intrin, gt, view_idx, background, extent,
            sh_degree=sh_degree, valid_wh=valid_wh, app_grad_reduce=hook,
        )

    def local_shard(fleet_state, extents, viewmats, intrins, gts, view_idx,
                    valid_whs, valid_b, background, sh_degree):
        return jax.vmap(
            lambda s, e, vm, it, g, vi, wh, vb: per_block(
                s, vm, it, g, vi, background, e, wh, vb, sh_degree
            ),
            axis_name="lblocks",
        )(fleet_state, extents, viewmats, intrins, gts, view_idx, valid_whs,
          valid_b)

    spec_b = P("blocks")
    spec_r = P()

    @functools.partial(jax.jit, static_argnames=("sh_degree",), donate_argnums=(0,))
    def fleet_step(fleet: FleetState, viewmats, intrins, gts, view_idx,
                   valid_whs, background, sh_degree: int):
        f = shard_map(
            functools.partial(local_shard, sh_degree=sh_degree),
            mesh=mesh,
            in_specs=(spec_b, spec_b, spec_b, spec_b, spec_b, spec_b, spec_b,
                      spec_b, spec_r),
            out_specs=(spec_b, spec_b),
            check_vma=False,
        )
        new_state, metrics = f(
            fleet.state, fleet.extents, viewmats, intrins, gts, view_idx,
            valid_whs, fleet.valid, background,
        )
        return FleetState(new_state, fleet.extents, fleet.valid), metrics

    return fleet_step


def make_fleet_loads(mesh: Mesh, image_size, sh_degree: int):
    """Sharded per-block tile-load / footprint-band / alive measurement.

    The fleet analog of the single-block trainer's ``_sample_loads``
    (train/loop.py): one SPMD program returns (B, num_tiles) exact
    per-tile loads, (B, n_bands) footprint band counts and (B,) alive
    counts — only small ints cross the host link. The fleet geometry is
    then sized over the UNION of blocks' measurements (max over blocks),
    because all blocks share ONE compiled step: every block gets the
    CUDA rasterizer's buffer growth (rasterizer_impl.cu:155-194), not
    just the single-block path."""
    from pcp_tpu.models import gaussians as G
    from pcp_tpu.ops.binning import (footprint_band_counts_device,
                                     tile_loads_device)
    from pcp_tpu.ops.projection import TILE, preprocess

    w, h = image_size
    tx = (w + TILE - 1) // TILE
    ty = (h + TILE - 1) // TILE

    def per_block(state: TrainState, viewmat, intrin):
        params = state.params
        scales = G.scaling_act(params["scaling"])
        opac = (G.opacity_act(params["opacity"])[:, 0]
                * state.alive.astype(jnp.float32))
        prep = preprocess(params["xyz"], scales, params["rotation"], opac,
                          G.sh_coeffs(params), viewmat, intrin, (w, h),
                          sh_degree)
        return (tile_loads_device(prep["rect"], tx, ty),
                footprint_band_counts_device(prep["rect"]),
                jnp.sum(state.alive.astype(jnp.int32)))

    def local_shard(fleet_state, viewmats, intrins):
        return jax.vmap(per_block)(fleet_state, viewmats, intrins)

    spec_b = P("blocks")

    @jax.jit
    def fleet_loads(fleet: FleetState, viewmats, intrins):
        return shard_map(
            local_shard, mesh=mesh,
            in_specs=(spec_b, spec_b, spec_b),
            out_specs=(spec_b, spec_b, spec_b),
            check_vma=False,
        )(fleet.state, viewmats, intrins)

    return fleet_loads, tx * ty


def fleet_autosize(ocfg: OptimConfig, loads, band_counts, num_tiles: int,
                   max_alive: int):
    """One geometry for the whole fleet from stacked per-(block, view)
    measurements — same policy as the single-block auto-tuner."""
    import dataclasses as _dc

    from pcp_tpu.ops.binning import choose_pair_levels, choose_tile_levels
    from pcp_tpu.train.config import format_tile_levels

    k0, levels = choose_tile_levels(loads, num_tiles)
    k_top = levels[-1][0] if levels else k0
    cap_slots = int(ocfg.capacity)
    acap = -(-int(1.5 * max_alive) // 65536) * 65536
    acap = acap if acap < cap_slots else 0
    plv = choose_pair_levels(band_counts)
    return _dc.replace(ocfg, max_per_tile=k_top,
                       tile_k_lo=k0 if levels else 0,
                       tile_levels=format_tile_levels(levels),
                       tile_hi_cap=0, active_cap=acap,
                       pair_levels=format_tile_levels(plv))


def make_fleet_densify(ocfg: OptimConfig, mesh: Mesh):
    spec_b = P("blocks")

    def local_shard(state, keys, extents, prune_big):
        return jax.vmap(
            lambda s, k, e: densify_impl(s, k, e, ocfg=ocfg, prune_big=prune_big)
        )(state, keys, extents)

    @functools.partial(jax.jit, static_argnames=("prune_big",), donate_argnums=(0,))
    def fleet_densify(fleet: FleetState, keys, prune_big: bool):
        f = shard_map(
            functools.partial(local_shard, prune_big=prune_big),
            mesh=mesh,
            in_specs=(spec_b, spec_b, spec_b),
            out_specs=spec_b,
            check_vma=False,
        )
        new_state = f(fleet.state, keys, fleet.extents)
        return FleetState(new_state, fleet.extents, fleet.valid)

    return fleet_densify


def make_fleet_opacity_reset(mesh: Mesh):
    spec_b = P("blocks")

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fleet_reset(fleet: FleetState):
        f = shard_map(
            jax.vmap(opacity_reset_impl), mesh=mesh,
            in_specs=(spec_b,), out_specs=spec_b, check_vma=False,
        )
        return FleetState(f(fleet.state), fleet.extents, fleet.valid)

    return fleet_reset


def stack_intrins(intrins: Sequence[CameraIntrin]) -> CameraIntrin:
    return CameraIntrin(
        fx=jnp.asarray([i.fx for i in intrins]),
        fy=jnp.asarray([i.fy for i in intrins]),
        cx=jnp.asarray([i.cx for i in intrins]),
        cy=jnp.asarray([i.cy for i in intrins]),
    )


class CameraBank(NamedTuple):
    """Device-resident per-block camera data: (B, C, ...) arrays sharded
    over the blocks axis. Removes the per-step host->device ground-truth
    image transfer — the host only sends (B,) camera indices."""

    viewmats: jnp.ndarray    # (B, C, 4, 4)
    fx: jnp.ndarray          # (B, C)
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    uid: jnp.ndarray         # (B, C) int32 appearance embedding ids
    gts: jnp.ndarray         # (B, C, H, W, 3) — zero-padded to the max size
    wh: jnp.ndarray          # (B, C, 2) int32 native (w, h) per camera
    n_cams: jnp.ndarray      # (B,) int32 live cameras (rest are repeats)


def build_camera_bank(block_cams, mesh: Mesh) -> CameraBank:
    """Stack per-block camera lists (padded by cycling) and shard them.
    Mixed resolutions are zero-padded into the max (H, W) frame; the step
    masks losses to each camera's native size (pad-and-mask)."""
    b = len(block_cams)
    c_max = max(len(cams) for cams in block_cams)
    w = max(c.width for cams in block_cams for c in cams)
    h = max(c.height for cams in block_cams for c in cams)
    viewmats = np.zeros((b, c_max, 4, 4), np.float32)
    fx = np.zeros((b, c_max), np.float32)
    fy = np.zeros((b, c_max), np.float32)
    cx = np.zeros((b, c_max), np.float32)
    cy = np.zeros((b, c_max), np.float32)
    uid = np.zeros((b, c_max), np.int32)
    gts = np.zeros((b, c_max, h, w, 3), np.float32)
    wh = np.zeros((b, c_max, 2), np.int32)
    n_cams = np.zeros((b,), np.int32)
    for bi, cams in enumerate(block_cams):
        n_cams[bi] = len(cams)
        for ci in range(c_max):
            cam = cams[ci % len(cams)]
            viewmats[bi, ci] = cam.viewmat
            fx[bi, ci] = cam.fx
            fy[bi, ci] = cam.fy
            cx[bi, ci] = cam.width / 2.0
            cy[bi, ci] = cam.height / 2.0
            uid[bi, ci] = cam.uid
            gts[bi, ci, : cam.height, : cam.width] = cam.gt_image
            wh[bi, ci] = (cam.width, cam.height)
    sharding = NamedSharding(mesh, P("blocks"))
    put = lambda x: jax.device_put(jnp.asarray(x), sharding)
    return CameraBank(
        put(viewmats), put(fx), put(fy), put(cx), put(cy), put(uid),
        put(gts), put(wh), put(n_cams),
    )


def make_fleet_step_banked(
    ocfg: OptimConfig,
    image_size,
    mesh: Mesh,
    *,
    use_appearance: bool = True,
    share_appearance: bool = False,
):
    """Fleet step reading cameras from a device-resident CameraBank; the
    host supplies only (B,) per-block camera indices per step."""
    impl = functools.partial(
        train_step_impl,
        ocfg=ocfg,
        image_size=image_size,
        use_appearance=use_appearance,
    )

    def local_shard(fleet_state, extents, bank: CameraBank, cam_idx,
                    valid_b, background, sh_degree):
        def per_block(s, e, bk, ci, vb):
            ci = ci % jnp.maximum(bk.n_cams, 1)
            intrin = CameraIntrin(bk.fx[ci], bk.fy[ci], bk.cx[ci], bk.cy[ci])
            hook = (_shared_app_reduce(vb)
                    if share_appearance and use_appearance else None)
            return impl(
                s, bk.viewmats[ci], intrin, bk.gts[ci], bk.uid[ci],
                background, e, sh_degree=sh_degree, valid_wh=bk.wh[ci],
                app_grad_reduce=hook,
            )

        return jax.vmap(
            lambda s, e, *bk_ci: per_block(
                s, e, CameraBank(*bk_ci[:-2]), bk_ci[-2], bk_ci[-1]),
            axis_name="lblocks",
        )(fleet_state, extents, *bank, cam_idx, valid_b)

    spec_b = P("blocks")

    @functools.partial(jax.jit, static_argnames=("sh_degree",), donate_argnums=(0,))
    def fleet_step(fleet: FleetState, bank: CameraBank, cam_idx, background,
                   sh_degree: int):
        f = shard_map(
            functools.partial(local_shard, sh_degree=sh_degree),
            mesh=mesh,
            in_specs=(spec_b, spec_b, jax.tree_util.tree_map(lambda _: spec_b, bank),
                      spec_b, spec_b, P()),
            out_specs=(spec_b, spec_b),
            check_vma=False,
        )
        new_state, metrics = f(
            fleet.state, fleet.extents, bank, cam_idx, fleet.valid, background
        )
        return FleetState(new_state, fleet.extents, fleet.valid), metrics

    return fleet_step


FLEET_CKPT_NAME = "chkpnt_fleet.npz"


def train_blocks_parallel(
    block_scenes,                  # List[SceneInfo] (one per block)
    cfg,                           # TrainRunConfig
    *,
    mesh: Optional[Mesh] = None,
    iterations: Optional[int] = None,
    log_fn=print,
    seed: int = 0,
    device_data: bool = False,
    block_dirs: Optional[List[str]] = None,   # per-block output dirs
    block_ids: Optional[List[str]] = None,    # names for progress_fn
    progress_fn=None,                          # progress_fn(bid, **fields)
    checkpoint_interval: int = 0,              # >0: rolling ckpt cadence
    resume: bool = False,                      # restore FLEET_CKPT_NAME
) -> List[TrainState]:
    """Train every block simultaneously on the mesh; returns per-block final
    states (ordered like ``block_scenes``).

    Host responsibilities per step: pick a random camera per block; with
    ``device_data`` the per-block camera banks (incl. ground-truth images)
    live sharded on the devices and the host sends only (B,) indices —
    otherwise it stacks and ships (viewmat, intrin, gt, uid) each step.

    Durability (training_report/checkpoint parity for the fleet path,
    train.py:160-162,188-243): with ``block_dirs`` set, every
    ``checkpoint_interval`` iterations each block writes a rolling
    ``chkpnt_fleet.npz`` + manifest progress via ``progress_fn``;
    ``cfg.test_iterations`` run a per-block L1/PSNR eval + TB scalars and
    ``cfg.save_iterations`` write PLY snapshots. ``resume=True`` restores
    each block from its rolling checkpoint and restarts the lockstep loop
    from the OLDEST restored iteration (blocks that were ahead retrain a
    few steps — checkpoints are written in lockstep, so iterations only
    diverge across a crash window).
    """
    import random as _random

    from pcp_tpu.scene import cameras as cam_mod
    from pcp_tpu.train import checkpoint as _ckpt
    from pcp_tpu.train.loop import evaluate_cameras, init_state, save_model

    if mesh is None:
        mesh = block_mesh()
    ocfg = cfg.optim
    iterations = iterations or ocfg.iterations
    if block_ids is None:
        block_ids = [f"block{i}" for i in range(len(block_scenes))]

    # Per-block camera lists; mixed resolutions pad into the max (w, h)
    # frame and the step masks losses to each camera's native size.
    block_cams = []
    for scene in block_scenes:
        cams = [cam_mod.from_info(i, cfg.model.resolution) for i in scene.cameras]
        block_cams.append(cams)
    sizes = {(c.width, c.height) for cams in block_cams for c in cams}
    w = max(s[0] for s in sizes)
    h = max(s[1] for s in sizes)
    if len(sizes) > 1 and log_fn:
        log_fn(f"fleet: {len(sizes)} camera resolutions; padding to "
               f"{w}x{h} with per-camera loss masks")

    share_app = bool(getattr(cfg.pipeline, "share_appearance", False)
                     and cfg.pipeline.use_appearance)
    key = jax.random.PRNGKey(seed)
    states, extents = [], []
    start_iter = 0
    ckpt_iters = []
    for bi, scene in enumerate(block_scenes):
        key, k = jax.random.split(key)
        st = init_state(scene, cfg, (w, h), k)
        if share_app and states:
            # ONE appearance state replicated across blocks: identical
            # init + identical (psum-reduced) grads keep every block's
            # copy in bitwise lockstep for the whole run
            st = st._replace(app=states[0].app, opt_a=states[0].opt_a)
        if resume and block_dirs:
            path = _os.path.join(block_dirs[bi], FLEET_CKPT_NAME)
            if _os.path.exists(path):
                st, it0 = _ckpt.load(path, st)
                ckpt_iters.append(int(it0))
            else:
                ckpt_iters.append(0)
        states.append(st)
        extents.append(scene.extent)
    if resume and ckpt_iters:
        start_iter = min(ckpt_iters)
        if log_fn:
            log_fn(f"fleet: resuming from iteration {start_iter} "
                   f"(per-block checkpoints at {ckpt_iters})")

    n_shards = mesh.devices.size
    fleet = pad_blocks(states, extents, n_shards)
    fleet = shard_fleet(fleet, mesh)
    b_pad = int(fleet.valid.shape[0])

    # --- fleet auto-sizing + in-training re-tune (--max_per_tile 0) ---
    # Same contract as the single-block trainer: measure per-tile loads /
    # footprint bands on sample views, size ONE shared geometry over the
    # max across blocks, re-measure on a cadence and reactively on any
    # overflow/saturation warning. Without this, one dense block would
    # re-create the round-3 k-cap saturation storm with no remedy.
    auto_tiles = ocfg.max_per_tile == 0
    loads_fn = None
    fleet_num_tiles = 0

    def _stack_cams(chosen):
        viewmats = jnp.asarray(np.stack([c.viewmat for c in chosen]))
        intrins = CameraIntrin(
            fx=jnp.asarray([c.fx for c in chosen], jnp.float32),
            fy=jnp.asarray([c.fy for c in chosen], jnp.float32),
            cx=jnp.asarray([c.width / 2.0 for c in chosen], jnp.float32),
            cy=jnp.asarray([c.height / 2.0 for c in chosen], jnp.float32),
        )
        return viewmats, intrins

    def _fleet_autosize(tag, n_sample=4):
        nonlocal loads_fn, fleet_num_tiles
        if loads_fn is None:
            # rects depend on geometry only — measure at SH degree 0
            loads_fn, fleet_num_tiles = make_fleet_loads(mesh, (w, h), 0)
        all_loads, all_bands, max_alive = [], [], 0
        for s in range(n_sample):
            chosen = []
            for bi in range(b_pad):
                cams_b = block_cams[min(bi, len(block_cams) - 1)]
                stride = max(1, len(cams_b) // n_sample)
                chosen.append(cams_b[(s * stride) % len(cams_b)])
            viewmats, intrins = _stack_cams(chosen)
            ld, bc, na = loads_fn(fleet, viewmats, intrins)
            all_loads.append(np.asarray(ld)[: len(block_scenes)])
            all_bands.append(np.asarray(bc)[: len(block_scenes)])
            max_alive = max(max_alive,
                            int(np.asarray(na)[: len(block_scenes)].max()))
        loads = np.concatenate(all_loads, axis=0)     # (B*S, num_tiles)
        bands = np.concatenate(all_bands, axis=0)
        new = fleet_autosize(ocfg, loads, bands, fleet_num_tiles, max_alive)
        if log_fn:
            log_fn(f"fleet auto tile levels ({tag}) -> base k0 "
                   f"{new.tile_k_lo or new.max_per_tile}, levels "
                   f"[{new.tile_levels or '-'}] (max load "
                   f"{int(loads.max())}, active_cap "
                   f"{new.active_cap or 'full'}, pair bands "
                   f"[{new.pair_levels or '-'}])")
        return new

    if auto_tiles:
        ocfg = _fleet_autosize("init")

    bank = None
    padded_cams = None
    if device_data:
        # pad camera lists to b_pad by reusing the last block's cameras
        padded_cams = block_cams + [block_cams[-1]] * (b_pad - len(block_cams))
        bank = build_camera_bank(padded_cams, mesh)

    def _build_fns(oc):
        if device_data:
            step = make_fleet_step_banked(
                oc, (w, h), mesh, use_appearance=cfg.pipeline.use_appearance,
                share_appearance=share_app,
            )
        else:
            step = make_fleet_step(
                oc, (w, h), mesh, use_appearance=cfg.pipeline.use_appearance,
                share_appearance=share_app,
            )
        return step, make_fleet_densify(oc, mesh)

    step_fn, densify_fn = _build_fns(ocfg)
    reset_fn = make_fleet_opacity_reset(mesh)

    retune_at = set()
    force_retune = set()
    if auto_tiles:
        r0 = int(_os.environ.get("PCP_RETUNE", "3000"))
        if r0 > 0:
            retune_at = {start_iter + 300, start_iter + 1000} | {
                i for i in range(0, iterations + 1, r0) if i > start_iter
            }

    background = jnp.asarray(
        [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0],
        jnp.float32,
    )
    rngs = [_random.Random(seed + 17 * i) for i in range(b_pad)]
    stacks: List[List[int]] = [[] for _ in range(b_pad)]

    def pick_idx(bi: int) -> int:
        cams = block_cams[min(bi, len(block_cams) - 1)]
        if not stacks[bi]:
            stacks[bi] = list(range(len(cams)))
            rngs[bi].shuffle(stacks[bi])
        return stacks[bi].pop()

    # per-block TB/JSONL loggers + a small eval set (the scene's test split
    # when present, else a 3-camera train sample — training_report's
    # sampled train views, train.py:200-204)
    loggers = [None] * len(block_scenes)
    eval_cams = [[] for _ in block_scenes]
    if block_dirs:
        from pcp_tpu.train.logging import TrainLogger

        for bi, d in enumerate(block_dirs):
            _os.makedirs(d, exist_ok=True)
            loggers[bi] = TrainLogger(d)
            eval_cams[bi] = block_cams[bi][:: max(1, len(block_cams[bi]) // 3)][:3]

    def checkpoint_all(it):
        host = jax.device_get(fleet)
        for bi in range(len(block_scenes)):
            st = unstack_state(host.state, bi)
            _ckpt.save(_os.path.join(block_dirs[bi], FLEET_CKPT_NAME), st, it)
            if progress_fn:
                progress_fn(block_ids[bi], status="running", ckpt_iter=it)
        return host

    for it in range(start_iter + 1, iterations + 1):
        sh_degree = min(cfg.model.sh_degree, (it - 1) // 1000)
        if device_data:
            cam_idx = jnp.asarray(
                [pick_idx(bi) for bi in range(b_pad)], jnp.int32
            )
            fleet, metrics = step_fn(fleet, bank, cam_idx, background, sh_degree)
        else:
            chosen = [
                block_cams[min(bi, len(block_cams) - 1)][pick_idx(bi)]
                for bi in range(b_pad)
            ]
            viewmats = jnp.asarray(np.stack([c.viewmat for c in chosen]))
            intrins = CameraIntrin(
                fx=jnp.asarray([c.fx for c in chosen], jnp.float32),
                fy=jnp.asarray([c.fy for c in chosen], jnp.float32),
                cx=jnp.asarray([c.width / 2.0 for c in chosen], jnp.float32),
                cy=jnp.asarray([c.height / 2.0 for c in chosen], jnp.float32),
            )
            gts_np = np.zeros((b_pad, h, w, 3), np.float32)
            for bi, c in enumerate(chosen):
                gts_np[bi, : c.height, : c.width] = c.gt_image
            gts = jnp.asarray(gts_np)
            valid_whs = jnp.asarray(
                [(c.width, c.height) for c in chosen], jnp.int32
            )
            view_idx = jnp.asarray([c.uid for c in chosen], jnp.int32)
            fleet, metrics = step_fn(
                fleet, viewmats, intrins, gts, view_idx, valid_whs,
                background, sh_degree,
            )

        # strict bounds, matching the reference cadence (train.py:140-152)
        if it < ocfg.densify_until_iter:
            if (it % ocfg.densification_interval == 0
                    and it > ocfg.densify_from_iter):
                key, k = jax.random.split(key)
                keys = jax.random.split(k, b_pad)
                fleet = densify_fn(fleet, keys, it > ocfg.opacity_reset_interval)
            if it % ocfg.opacity_reset_interval == 0 or (
                cfg.model.white_background and it == ocfg.densify_from_iter
            ):
                fleet = reset_fn(fleet)

        if it in retune_at:
            from pcp_tpu.train.loop import retune_decision, table_slot_cost

            cap_slots = int(fleet.state.alive.shape[1])
            new_ocfg = _fleet_autosize(f"iter {it}")
            cur_cost = table_slot_cost(ocfg, fleet_num_tiles, cap_slots)
            new_cost = table_slot_cost(new_ocfg, fleet_num_tiles, cap_slots)
            if retune_decision(ocfg, new_ocfg, cur_cost, new_cost,
                               it in force_retune):
                ocfg = new_ocfg
                step_fn, densify_fn = _build_fns(ocfg)
                if log_fn:
                    log_fn(f"[retune] fleet iter {it}: table slots "
                           f"{cur_cost} -> {new_cost}; recompiling step")

        if block_dirs and checkpoint_interval and \
                it % checkpoint_interval == 0 and it < iterations:
            checkpoint_all(it)

        if block_dirs and it in getattr(cfg, "test_iterations", ()):
            host = jax.device_get(fleet)
            sh_now = min(cfg.model.sh_degree, (it - 1) // 1000)
            for bi in range(len(block_scenes)):
                if not eval_cams[bi]:
                    continue
                st = unstack_state(host.state, bi)
                m = evaluate_cameras(st, eval_cams[bi], sh_now, background,
                                     ocfg)
                if log_fn:
                    log_fn(f"[eval {it}] {block_ids[bi]} l1 {m['l1']:.4f} "
                           f"psnr {m['psnr']:.2f}")
                if loggers[bi]:
                    loggers[bi].scalars(it, {
                        "test/loss_viewpoint_l1": m["l1"],
                        "test/loss_viewpoint_psnr": m["psnr"],
                    })
                if progress_fn:
                    progress_fn(block_ids[bi], eval_iter=it,
                                psnr=round(m["psnr"], 3))

        if block_dirs and it in getattr(cfg, "save_iterations", ()) and \
                it < iterations:
            host = jax.device_get(fleet)
            for bi in range(len(block_scenes)):
                save_model(unstack_state(host.state, bi), block_dirs[bi], it,
                           f"{block_ids[bi]}_point_cloud")

        if it % 100 == 0 or it == 1:
            losses = np.asarray(metrics["loss"])[: len(block_scenes)]
            if log_fn:
                log_fn(f"fleet iter {it:6d} mean loss {losses.mean():.5f}")
            for bi, lg in enumerate(loggers):
                if lg:
                    lg.scalars(it, {
                        "train_loss_patches/total_loss":
                            float(losses[bi]),
                        "total_points":
                            float(np.asarray(metrics["n_visible"])[bi]),
                    })
            overflow = np.asarray(metrics["overflow"])[: len(block_scenes)]
            if overflow.any():
                n_pairs = np.asarray(metrics["n_pairs"])[: len(block_scenes)]
                bad = np.nonzero(overflow)[0].tolist()
                if log_fn:
                    log_fn(
                        f"[warn] fleet iter {it}: tile-pair overflow in "
                        f"blocks {bad} (max n_pairs {int(n_pairs.max())}); "
                        "nearest Gaussians are kept but quality degrades — "
                        "raise --pairs_per_gaussian"
                    )
                if auto_tiles and ocfg.active_cap > 0:
                    # a block outgrew the alive-scaled bound between
                    # re-tunes: re-tune now instead of waiting the cadence
                    retune_at.add(it + 1)
                    force_retune.add(it + 1)
            saturated = np.asarray(metrics["tile_saturated"])[: len(block_scenes)]
            if saturated.any():
                loads = np.asarray(metrics["max_tile_load"])[: len(block_scenes)]
                if log_fn:
                    log_fn(
                        f"[warn] fleet iter {it}: per-tile saturation in "
                        f"blocks {np.nonzero(saturated)[0].tolist()} "
                        f"(densest tile {int(loads.max())} > max_per_tile="
                        f"{ocfg.max_per_tile}) — raise --max_per_tile"
                    )
                if auto_tiles:
                    # some block's densest tile outgrew k_top: re-size now
                    retune_at.add(it + 1)
                    force_retune.add(it + 1)

    host_fleet = jax.device_get(fleet)
    if block_dirs and checkpoint_interval:
        for bi in range(len(block_scenes)):
            st = unstack_state(host_fleet.state, bi)
            _ckpt.save(_os.path.join(block_dirs[bi], FLEET_CKPT_NAME), st,
                       iterations)
    for lg in loggers:
        if lg:
            lg.close()
    return [unstack_state(host_fleet.state, i) for i in range(len(block_scenes))]
