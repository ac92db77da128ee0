"""Host-side training loop for one scene/block.

Mirrors training() (train.py:40-243): random camera order per epoch, SH
degree warm-up (+1 every 1000 iters), densify cadence (from iter 1000 to
30000 every 200 while under capacity), opacity reset every 3000, PLY saves
at save_iterations, L1/PSNR eval at test_iterations, and full checkpoints.

The GUI socket poll (network_gui) lives in pcp_tpu.viewer and is optional.
"""

from __future__ import annotations

import functools
import json
import os
import random
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pcp_tpu.models import gaussians as G
from pcp_tpu.models.appearance import init_appearance
from pcp_tpu.scene import cameras as cam_mod
from pcp_tpu.scene.dataset import SceneInfo, split_train_test
from pcp_tpu.train import checkpoint as ckpt
from pcp_tpu.train import optim
from pcp_tpu.train.config import (TrainRunConfig, parse_tile_levels,
                                  save_cfg_args)
from pcp_tpu.train.step import (
    TrainState,
    make_densify_step,
    make_train_step,
    opacity_reset_step,
    render_gaussians,
)


def init_state(
    scene: SceneInfo, cfg: TrainRunConfig, image_size, key
) -> TrainState:
    gcfg = G.GaussianConfig(
        sh_degree=cfg.model.sh_degree, capacity=cfg.optim.capacity,
        percent_dense=cfg.optim.percent_dense,
    )
    params, alive = G.create_from_pcd(scene.points, scene.colors, gcfg)
    use_app = cfg.pipeline.use_appearance
    app = init_appearance(key, image_size) if use_app else None
    return TrainState(
        params=params,
        app=app,
        opt_g=optim.init_adam(params),
        opt_a=optim.init_adam(app) if use_app else None,
        alive=alive,
        stats=G.init_densify_stats(cfg.optim.capacity),
    )


def evaluate_cameras(state, cams, sh_degree, background, ocfg) -> Dict[str, float]:
    """L1/PSNR over held-out cameras (training_report, train.py:188-243).

    Rendering is batched per image size and L1/PSNR reduce ON DEVICE
    (eval/render_batch.eval_views): hundreds of test views run as a few
    vmapped XLA programs returning two scalars each, instead of one eager
    dispatch + host-side metric math per camera."""
    from pcp_tpu.eval.render_batch import eval_views

    # PCP_EVAL_BATCH caps the vmapped view batch: the default 8 is right
    # for small/medium blocks; at reference scale (2M-slot capacity,
    # megapixel views) 8 concurrent render graphs would multiply the
    # binning workspace past HBM — scale runs set 1.
    max_batch = int(os.environ.get("PCP_EVAL_BATCH", "8"))
    l1s, psnrs = [], []
    by_size: Dict[tuple, list] = {}
    for cam in cams:
        by_size.setdefault((cam.width, cam.height), []).append(cam)
    for group in by_size.values():
        l1, ps = eval_views(
            state.params, state.alive, group, sh_degree, background,
            max_per_tile=ocfg.max_per_tile,
            pairs_per_gaussian=ocfg.pairs_per_gaussian,
            tile_k_lo=ocfg.tile_k_lo, tile_hi_cap=ocfg.tile_hi_cap,
            tile_levels=parse_tile_levels(ocfg.tile_levels),
            batch=min(max_batch, len(group)),
        )
        l1s.extend(l1)
        psnrs.extend(ps)
    return {
        "l1": float(np.mean(l1s)) if l1s else 0.0,
        "psnr": float(np.mean(psnrs)) if psnrs else 0.0,
    }


def poll_viewer(viewer, state, sh_degree, background, ocfg, training_done):
    """One viewer poll (train.py:67-84): accept, render the requested view,
    send raw RGB + the verify string. Returns whether to keep looping the
    poll (keep_alive while paused)."""
    import math

    from pcp_tpu.ops.projection import CameraIntrin

    if viewer is None or not viewer.try_connect():
        return False
    cam = viewer.receive()
    if cam is None:
        return False
    import jax.numpy as jnp_

    fx = cam.width / (2.0 * math.tan(cam.fovx * 0.5))
    fy = cam.height / (2.0 * math.tan(cam.fovy * 0.5))
    intrin = CameraIntrin(
        fx=jnp_.float32(fx), fy=jnp_.float32(fy),
        cx=jnp_.float32(cam.width / 2.0), cy=jnp_.float32(cam.height / 2.0),
    )
    img, _ = render_gaussians(
        state.params, state.alive,
        jnp_.asarray(cam.world_view_transform.T), intrin,
        (cam.width, cam.height), background, sh_degree,
        max_per_tile=ocfg.max_per_tile,
        max_pairs=ocfg.pairs_per_gaussian * state.params["xyz"].shape[0],
        scaling_modifier=cam.scaling_modifier,
    )
    arr = np.asarray(jnp_.clip(img, 0, 1) * 255).astype(np.uint8)
    viewer.send(arr, "pcp_tpu")
    return cam.keep_alive and not cam.do_training and not training_done


def table_slot_cost(oc, num_tiles: int, capacity: int) -> int:
    """Total static slots the composite path pays for geometry ``oc``:
    tile-table slots plus the binning expansion's sort length. The
    re-tuner compares this across re-measurements — folding the expansion
    in makes an active_cap/pair_levels change alone recompile-worthy."""
    from pcp_tpu.ops.binning import expansion_key_slots
    from pcp_tpu.train.config import parse_tile_levels

    levels = parse_tile_levels(oc.tile_levels)
    if not levels and oc.tile_hi_cap > 0:
        levels = ((oc.max_per_tile, oc.tile_hi_cap),)
    if levels and oc.tile_k_lo > 0:
        table = num_tiles * oc.tile_k_lo + sum(k * t for k, t in levels)
    else:
        table = num_tiles * oc.max_per_tile
    return table + expansion_key_slots(
        capacity, num_tiles, oc.active_cap, parse_tile_levels(oc.pair_levels))


def retune_decision_core(equal: bool, cur_k: int, new_k: int,
                         cur_cost: int, new_cost: int,
                         forced: bool) -> bool:
    """Geometry-agnostic core of retune_decision (works for a single
    geometry or the weighted aggregate of view-class geometries)."""
    if equal:
        return False
    if forced and (new_k != cur_k
                   or abs(new_cost - cur_cost) > 0.02 * max(cur_cost, 1)):
        return True
    return (abs(new_cost - cur_cost) > 0.2 * max(cur_cost, 1)
            or new_k > cur_k)


def retune_decision(ocfg, new_ocfg, cur_cost: int, new_cost: int,
                    forced: bool) -> bool:
    """Should a re-measured geometry replace the compiled one?

    Scheduled re-tunes recompile only on a >20% slot-cost move or a grown
    k_top (the hysteresis avoids recompile churn). Reactive/forced
    re-tunes (scheduled by an overflow or saturation warning) adopt any
    materially changed geometry — but a forced re-tune whose re-measured
    geometry is within 2% and fixes nothing (same k_top) must NOT
    recompile an equivalent program every 100 iters: that was the k-cap
    saturation storm of the round-3 scale run (~40 s recompile per 100
    iters, ~25% of wall; see PERF_NOTES and ops/binning._cap_fit)."""
    return retune_decision_core(
        new_ocfg == ocfg, ocfg.max_per_tile, new_ocfg.max_per_tile,
        cur_cost, new_cost, forced)


def train_scene(
    scene: SceneInfo,
    cfg: TrainRunConfig,
    *,
    save_name: str = "point_cloud",
    log_fn: Optional[Callable[[str], None]] = print,
    state: Optional[TrainState] = None,
    start_iter: int = 0,
    viewer=None,
    profile: bool = False,
    debug: bool = False,
) -> TrainState:
    """Train one scene/block; writes outputs under cfg.model.model_path.

    ``save_name`` controls the PLY naming: Scene saves `point_cloud_1.ply`,
    PartitionScene `{id}_point_cloud.ply` (scene/__init__.py:81,167) — pass
    the stem accordingly.
    """
    model_path = cfg.model.model_path
    os.makedirs(model_path, exist_ok=True)
    save_cfg_args(model_path, cfg)
    ocfg = cfg.optim

    train_infos, test_infos = split_train_test(
        scene.cameras, cfg.model.eval, cfg.model.llffhold,
        explicit_test=getattr(scene, "test_camera_uids", None),
    )
    cams = [cam_mod.from_info(i, cfg.model.resolution) for i in train_infos]
    test_cams = [cam_mod.from_info(i, cfg.model.resolution) for i in test_infos]
    if not cams:
        raise ValueError("no training cameras")
    sizes = sorted({(c.width, c.height) for c in cams})
    w, h = sizes[0]
    if len(sizes) > 1 and log_fn:
        log_fn(f"{len(sizes)} camera resolutions "
               f"{sizes}; compiling one train step per size")

    background = jnp.asarray(
        [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0],
        jnp.float32,
    )
    key = jax.random.PRNGKey(cfg.seed)
    if state is None:
        key, init_key = jax.random.split(key)
        state = init_state(scene, cfg, (w, h), init_key)

    # --max_per_tile 0: auto-size the per-tile slot cap from measured
    # loads on sample views (smallest CH multiple with 1.6x headroom) —
    # compositing cost scales ~linearly with K, so right-sizing it is the
    # single biggest per-scene knob (PERF_NOTES "max_per_tile
    # right-sizing"). Densify growth is covered by the headroom + the
    # saturation warning below.
    auto_tiles = ocfg.max_per_tile == 0
    # Escalating safety margin for the measured pair-expansion bands: a
    # band sized at 1.3x the max over SAMPLED views can still overflow on
    # an unsampled view, and every reactive re-tune recompiles (~minutes
    # through a remote-compile tunnel). Each overflow-armed re-tune
    # widens the margin so the churn provably terminates.
    band_headroom = 1.3
    # view-class geometry (OptimConfig.view_classes > 1): cluster views by
    # load profile, one compiled step per class (binning.cluster_views)
    n_view_classes = max(1, int(getattr(ocfg, "view_classes", 1))) \
        if auto_tiles else 1

    def _sample_loads(n_sample=8, from_cams=None):
        """Per-tile loads + footprint band counts on sample views of the
        CURRENT state, computed on device — only (num_tiles,) +
        (n_bands,) ints cross the host link. ``from_cams`` overrides the
        sampled pool (train cams by default; eval passes test cams)."""
        from pcp_tpu.ops.binning import (footprint_band_counts_device,
                                         tile_loads_device)
        from pcp_tpu.ops.projection import TILE as _TILE
        from pcp_tpu.ops.projection import preprocess as _preprocess

        @functools.partial(jax.jit, static_argnames=("wh", "deg", "tx", "ty"))
        def loads_fn(xyz, scaling, rotation, opacity, alive, sh_a,
                     viewmat_s, intrin_s, wh, deg, tx, ty):
            scales_a = G.scaling_act(scaling)
            opac_a = (G.opacity_act(opacity)[:, 0]
                      * alive.astype(jnp.float32))
            prep_s = _preprocess(xyz, scales_a, rotation, opac_a, sh_a,
                                 viewmat_s, intrin_s, wh, deg)
            return (tile_loads_device(prep_s["rect"], tx, ty),
                    footprint_band_counts_device(prep_s["rect"]))

        pool = cams if from_cams is None else from_cams
        sample = pool[:: max(1, len(pool) // n_sample)][:n_sample]
        # tile rects depend on geometry only, never on SH color — measure
        # at degree 0 with the DC band alone. Eagerly materializing the
        # full (capacity, 16, 3) SH concat here was a 400 MB HBM spike on
        # top of live step buffers (OOM at the reference operating point;
        # the fleet's make_fleet_loads already measures at degree 0).
        out, bands = [], []
        for cam in sample:
            viewmat_s, intrin_s = cam_mod.camera_device_arrays(cam)
            tx = (cam.width + _TILE - 1) // _TILE
            ty = (cam.height + _TILE - 1) // _TILE
            ld, bc = loads_fn(
                state.params["xyz"], state.params["scaling"],
                state.params["rotation"], state.params["opacity"],
                state.alive, state.params["f_dc"], viewmat_s, intrin_s,
                (cam.width, cam.height), 0, tx, ty)
            out.append(np.asarray(ld))
            bands.append(np.asarray(bc))
        num_tiles = max(a.shape[0] for a in out)
        loads = np.stack([np.pad(a, (0, num_tiles - a.shape[0]))
                          for a in out])
        return loads, num_tiles, np.stack(bands), sample

    def _autosize(tag):
        """Measure loads and size the tile/pair geometry. Returns
        (class_ocfgs, class_of_uid, class_weights, num_tiles); a single
        entry and an empty map in the (default) one-class mode."""
        import dataclasses as _dc

        from pcp_tpu.ops.binning import (choose_pair_levels,
                                         choose_tile_levels, cluster_views)
        from pcp_tpu.train.config import format_tile_levels

        loads, num_tiles, band_counts, sampled = _sample_loads(
            48 if n_view_classes > 1 else 16)
        # alive-scaled class tables: bound the binning expansion by the
        # live population (densify headroom 1.5x, snapped to 64k so small
        # drift doesn't churn recompiles); capacity-scaled when the bound
        # wouldn't actually shrink anything.
        n_alive = int(np.asarray(state.alive).sum())
        cap_slots = int(state.alive.shape[0])
        acap = -(-int(1.5 * n_alive) // 65536) * 65536
        acap = acap if acap < cap_slots else 0

        labels, n_cls = cluster_views(loads, n_view_classes)
        ocfgs, cmap = [], {}
        for c in range(n_cls):
            rows = labels == c
            k0, levels = choose_tile_levels(loads[rows], num_tiles)
            k_top = levels[-1][0] if levels else k0
            plv = choose_pair_levels(band_counts[rows],
                                     headroom=band_headroom)
            ocfgs.append(_dc.replace(
                ocfg, max_per_tile=k_top,
                tile_k_lo=k0 if levels else 0,
                tile_levels=format_tile_levels(levels),
                tile_hi_cap=0, active_cap=acap,
                pair_levels=format_tile_levels(plv)))
            if log_fn:
                extra = (f" [class {c}: {int(rows.sum())} sampled views]"
                         if n_cls > 1 else "")
                log_fn(f"auto tile levels ({tag}){extra} -> base k0 {k0}, "
                       f"levels [{ocfgs[-1].tile_levels or '-'}] "
                       f"(max load {int(loads[rows].max())}, active_cap "
                       f"{acap or 'full'}, pair bands "
                       f"[{ocfgs[-1].pair_levels or '-'}])")
        weights = [1] * n_cls
        if n_cls > 1:
            for cam_s, lab in zip(sampled, labels):
                cmap[cam_s.uid] = int(lab)
            # unmeasured views: nearest SAMPLED view by camera center
            # (locality in pose tracks locality in load profile); a wrong
            # guess only risks a saturation warning, which the reactive
            # re-tune path already handles.
            centers = np.stack([
                -np.asarray(c.viewmat)[:3, :3].T
                @ np.asarray(c.viewmat)[:3, 3] for c in sampled])
            for cam_u in cams:
                if cam_u.uid in cmap:
                    continue
                ctr = (-np.asarray(cam_u.viewmat)[:3, :3].T
                       @ np.asarray(cam_u.viewmat)[:3, 3])
                near = int(np.argmin(
                    np.sum((centers - ctr) ** 2, axis=1)))
                cmap[cam_u.uid] = int(labels[near])
            weights = [
                sum(1 for c_ in cams if cmap.get(c_.uid, 0) == c)
                for c in range(n_cls)
            ]
        return ocfgs, cmap, weights, num_tiles

    def _eval_geometry():
        """Size a one-class geometry from the HELD-OUT views' measured
        loads (they are never part of any training class); standard
        autosizer headroom, so a test view resembling a dense class
        cannot silently saturate tiles and understate eval metrics."""
        import dataclasses as _dc

        from pcp_tpu.ops.binning import choose_pair_levels, choose_tile_levels
        from pcp_tpu.train.config import format_tile_levels

        loads, num_tiles, band_counts, _ = _sample_loads(
            8, from_cams=test_cams)
        n_alive = int(np.asarray(state.alive).sum())
        cap_slots = int(state.alive.shape[0])
        acap = -(-int(1.5 * n_alive) // 65536) * 65536
        acap = acap if acap < cap_slots else 0
        k0, levels = choose_tile_levels(loads, num_tiles)
        return _dc.replace(
            ocfg, max_per_tile=levels[-1][0] if levels else k0,
            tile_k_lo=k0 if levels else 0,
            tile_levels=format_tile_levels(levels), tile_hi_cap=0,
            active_cap=acap,
            pair_levels=format_tile_levels(choose_pair_levels(band_counts)))

    class_of_uid = {}
    class_weights = [1]
    if auto_tiles:
        class_ocfgs, class_of_uid, class_weights, _ = _autosize("init")
        ocfg = class_ocfgs[0]
    else:
        class_ocfgs = [ocfg]

    # one compiled step per distinct camera resolution (the appearance net
    # is fully convolutional, so a single param set serves every size)
    # x one per view class (make_train_step caches by config, so equal
    # class geometries share a compile)
    def _build_steps(ocs):
        return {
            (s, ci): make_train_step(
                oc, s, scene.extent,
                use_appearance=cfg.pipeline.use_appearance)
            for s in sizes
            for ci, oc in enumerate(ocs)
        }

    step_fns = _build_steps(class_ocfgs)
    densify_fn = make_densify_step(ocfg, scene.extent)

    # Dynamic re-tuning (the analog of the CUDA rasterizer's buffer
    # resizing, rasterizer_impl.cu:155-194): tile loads COLLAPSE within
    # the first ~1k iterations as fat kNN-init splats shrink, then drift
    # with densify — a geometry sized at init can be 3-5x too generous for
    # 95% of a 30k run. Re-measure on a cadence; rebuild (recompile) the
    # step only when the slot cost moves >20% or the max load outgrows
    # the current k_hi.
    retune_at = set()
    force_retune = set()
    if auto_tiles:
        import os as _os

        r0 = int(_os.environ.get("PCP_RETUNE", "3000"))
        if r0 > 0:
            retune_at = {start_iter + 300, start_iter + 1000} | {
                i for i in range(0, ocfg.iterations + 1, r0)
                if i > start_iter
            }

    def _table_cost(oc, num_tiles):
        return table_slot_cost(oc, num_tiles, int(state.alive.shape[0]))

    from pcp_tpu.train.logging import TrainLogger

    logger = TrainLogger(model_path)
    if profile:
        # jax.profiler trace (SURVEY §5: replaces the reference's CUDA-event
        # iter timing, train.py:57-58); view with tensorboard or xprof.
        jax.profiler.start_trace(os.path.join(model_path, "trace"))
    rng = random.Random(cfg.seed)
    stack: List[int] = []
    ema_loss = 0.0
    t0 = time.time()
    t_last = t0
    it_last = start_iter
    # GT-image residency (reference data_device, arguments/__init__.py:57):
    # "device" uploads each train image once and reuses the device buffer
    # every epoch; "host" re-uploads per step for scenes whose image set
    # exceeds HBM headroom. Device-resident images are stored as uint8 —
    # the on-disk sources are 8-bit PNG/JPG, so u8 round-trips them
    # exactly at 1/4 the HBM (a 59-view 1MP bank drops 723 -> 181 MB;
    # the step casts back to f32 in-graph, which XLA fuses into the
    # loss). Images whose values fall outside [0, 1] (float EXR-style
    # sources) stay f32.
    gt_dev: Dict[int, jnp.ndarray] = {}

    def gt_of(cam):
        if cfg.model.data_device != "device":
            return jnp.asarray(cam.gt_image)
        buf = gt_dev.get(cam.uid)
        if buf is None:
            img = np.asarray(cam.gt_image)
            if img.dtype != np.uint8 and img.min() >= 0.0 and img.max() <= 1.0:
                img = np.round(img * 255.0).astype(np.uint8)
            buf = gt_dev.setdefault(cam.uid, jnp.asarray(img))
        return buf
    for it in range(start_iter + 1, ocfg.iterations + 1):
        if viewer is not None:
            sh_now = min(cfg.model.sh_degree, (it - 1) // 1000)
            while poll_viewer(viewer, state, sh_now, background, ocfg,
                              it >= ocfg.iterations):
                pass
        if not stack:
            stack = list(range(len(cams)))
            rng.shuffle(stack)
        cam = cams[stack.pop()]
        sh_degree = min(cfg.model.sh_degree, (it - 1) // 1000)

        viewmat, intrin = cam_mod.camera_device_arrays(cam)
        cls_step = class_of_uid.get(cam.uid, 0)
        ocfg_step = class_ocfgs[cls_step]
        step_fn = step_fns[((cam.width, cam.height), cls_step)]
        if debug:
            # step_fn donates the state; snapshot it to host first
            prev_host = jax.device_get(state)
        state, metrics = step_fn(
            state,
            viewmat,
            intrin,
            gt_of(cam),
            jnp.int32(cam.uid),
            background,
            sh_degree,
        )
        if debug and not np.isfinite(float(metrics["loss"])):
            # Forensic dump, mirroring the reference rasterizer's
            # snapshot_fw.dump-on-CUDA-error (diff_gaussian_rasterization/
            # __init__.py:83-90) + --detect_anomaly (train.py:256).
            dump = os.path.join(model_path, f"nan_snapshot_{it}.npz")
            _dump_step_inputs(dump, prev_host, cam, it, sh_degree)
            raise FloatingPointError(
                f"non-finite loss at iteration {it} "
                f"(loss={float(metrics['loss'])}); step inputs dumped to "
                f"{dump}"
            )

        # --- densification cadence (train.py:140-152; both bounds are
        # STRICT in the reference — with densify_until == iterations no
        # reset fires on the final step, so the saved model never ends
        # on freshly-reset opacities) ---
        if it < ocfg.densify_until_iter:
            if (it % ocfg.densification_interval == 0
                    and it > ocfg.densify_from_iter):
                key, dkey = jax.random.split(key)
                state = densify_fn(
                    state, dkey, it > ocfg.opacity_reset_interval
                )
            if it % ocfg.opacity_reset_interval == 0 or (
                cfg.model.white_background and it == ocfg.densify_from_iter
            ):
                state = opacity_reset_step(state)

        if it in retune_at:
            new_ocfgs, new_cmap, new_w, num_tiles = _autosize(f"iter {it}")
            cur_cost = sum(
                w * _table_cost(oc, num_tiles)
                for oc, w in zip(class_ocfgs, class_weights)
            ) // max(sum(class_weights), 1)
            new_cost = sum(
                w * _table_cost(oc, num_tiles)
                for oc, w in zip(new_ocfgs, new_w)
            ) // max(sum(new_w), 1)
            # A forced re-tune must also adopt a geometry where ANY
            # class's k_top moved, not just the cross-class max — a
            # non-max class whose densest tile outgrew its own table
            # would otherwise be rejected by the 2% hysteresis and keep
            # dropping far Gaussians (ADVICE r4 #2). Class identity is
            # not stable across re-measurements, so compare the sorted
            # k multiset.
            ks_changed = (
                sorted(o.max_per_tile for o in new_ocfgs)
                != sorted(o.max_per_tile for o in class_ocfgs))
            if retune_decision_core(
                    new_ocfgs == class_ocfgs,
                    max(o.max_per_tile for o in class_ocfgs),
                    max(o.max_per_tile for o in new_ocfgs),
                    cur_cost, new_cost, it in force_retune) or (
                    it in force_retune and ks_changed):
                class_ocfgs, class_of_uid, class_weights = (
                    new_ocfgs, new_cmap, new_w)
                ocfg = class_ocfgs[0]
                step_fns = _build_steps(class_ocfgs)
                if log_fn:
                    log_fn(f"[retune] iter {it}: table slots "
                           f"{cur_cost} -> {new_cost}; recompiling step")

        if it % 100 == 0 or it == 1:
            loss = float(metrics["loss"])
            ema_loss = loss if it == 1 else 0.6 * ema_loss + 0.4 * loss
            now = time.time()
            n_alive = int(np.asarray(state.alive).sum())
            if bool(metrics["overflow"]):
                if log_fn:
                    log_fn(
                        f"[warn] iter {it}: binning capacity overflow "
                        f"({int(metrics['n_dropped'])} pairs dropped; "
                        f"n_pairs {int(metrics['n_pairs'])}) — population "
                        f"outgrew active_cap/class tables; raise "
                        f"--pairs_per_gaussian if it persists after re-tune"
                    )
                if auto_tiles and ocfg_step.active_cap > 0:
                    # population outgrew the alive-scaled bound between
                    # re-tunes: re-tune now instead of waiting the cadence
                    # (with a wider band margin, so repeated re-tunes
                    # converge instead of churning recompiles)
                    band_headroom = min(band_headroom * 1.25, 3.0)
                    retune_at.add(it + 1)
                    force_retune.add(it + 1)
            if bool(metrics.get("tile_saturated", False)):
                if log_fn:
                    log_fn(
                        f"[warn] iter {it}: per-tile saturation "
                        f"(densest tile holds "
                        f"{int(metrics['max_tile_load'])} Gaussians > "
                        f"max_per_tile={ocfg_step.max_per_tile}); farthest "
                        f"are dropped in dense tiles — raise --max_per_tile"
                    )
                if auto_tiles:
                    # the densest tile outgrew k_top: re-size now
                    retune_at.add(it + 1)
                    force_retune.add(it + 1)
            logger.scalars(it, {
                "train_loss_patches/total_loss": loss,
                "total_points": n_alive,
                "iter_time": (now - t_last) / max(it - it_last, 1),
                "n_pairs": float(metrics["n_pairs"]),
            })
            t_last, it_last = now, it
            if log_fn:
                log_fn(
                    f"iter {it:6d} loss {ema_loss:.5f} "
                    f"alive {n_alive} ({(now - t0):.1f}s)"
                )
        if it in cfg.test_iterations and test_cams:
            # Held-out views were never measured/classed, and no single
            # class's geometry is guaranteed to dominate the others
            # element-wise (a class can have the widest k_top but a
            # smaller k_lo or fewer level rows) — so measure the TEST
            # views' actual loads and size an eval-specific geometry,
            # exactly like the training autosizer (ADVICE r4 #1).
            if auto_tiles:
                ocfg_eval = _eval_geometry()
            else:
                ocfg_eval = max(class_ocfgs, key=lambda o: o.max_per_tile)
            m = evaluate_cameras(state, test_cams, sh_degree, background,
                                 ocfg_eval)
            if log_fn:
                log_fn(f"[eval {it}] test l1 {m['l1']:.4f} psnr {m['psnr']:.2f}")
            logger.scalars(it, {"test/loss_viewpoint_l1": m["l1"],
                                "test/loss_viewpoint_psnr": m["psnr"]})
            logger.histogram(
                it, "scene/opacity_histogram",
                np.asarray(G.opacity_act(state.params["opacity"]))[
                    np.asarray(state.alive), 0
                ],
            )
            with open(os.path.join(model_path, f"eval_{it}.json"), "w") as f:
                json.dump(m, f)
        if it in cfg.save_iterations:
            save_model(state, model_path, it, save_name)
        if it in cfg.checkpoint_iterations:
            ckpt.save(os.path.join(model_path, f"chkpnt{it}.npz"), state, it)
        # Cooperative early stop: `touch <model_path>/STOP` makes a
        # wall-clock-bounded run save a PLY + resumable checkpoint at the
        # CURRENT iteration and exit cleanly (the SIGKILL alternative loses
        # everything since the last save_iterations boundary).
        if it % 50 == 0 and os.path.exists(os.path.join(model_path, "STOP")):
            if log_fn:
                log_fn(f"STOP file seen at iter {it}: saving and exiting")
            save_model(state, model_path, it, save_name)
            ckpt.save(os.path.join(model_path, f"chkpnt{it}.npz"), state, it)
            if profile:
                jax.profiler.stop_trace()
            logger.close()
            return state

    save_model(state, model_path, ocfg.iterations, save_name)
    if profile:
        jax.profiler.stop_trace()
    logger.close()
    return state


def _dump_step_inputs(path: str, state_host, cam, iteration: int,
                      sh_degree: int) -> None:
    """Flatten the pre-step TrainState + camera inputs into one npz."""
    leaves, _ = jax.tree_util.tree_flatten(state_host)
    arrs = {f"state_leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrs["viewmat"] = np.asarray(cam.viewmat)
    arrs["gt_image"] = np.asarray(cam.gt_image)
    arrs["intrin"] = np.asarray([cam.fx, cam.fy, cam.width / 2.0,
                                 cam.height / 2.0], np.float32)
    arrs["view_uid"] = np.asarray(cam.uid)
    arrs["iteration"] = np.asarray(iteration)
    arrs["sh_degree"] = np.asarray(sh_degree)
    np.savez_compressed(path, **arrs)


def save_model(state: TrainState, model_path: str, iteration: int, stem: str):
    """PLY snapshot under point_cloud/iteration_<it>/ (scene/__init__.py:85-87)."""
    out_dir = os.path.join(model_path, "point_cloud", f"iteration_{iteration}")
    os.makedirs(out_dir, exist_ok=True)
    G.save_gaussians_ply(
        os.path.join(out_dir, f"{stem}.ply"), state.params, state.alive
    )
