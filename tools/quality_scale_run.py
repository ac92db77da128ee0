"""Reference-operating-point proof on the real chip (VERDICT round-2 #1).

The reference's contract is a ~500k-point block from a multi-million-point
scene, trained for 30,000 iterations at ~megapixel resolution while
densifying toward a multi-million-Gaussian cap
(/root/reference/scene/ptgs/shen_partition_utils.py:125 threshold 500k,
arguments/__init__.py:90 iters 30000, train.py:146 cap 6e6,
render_and_eval.sh Mill-19 at ~1MP). This tool drives that point end to
end on pcp_tpu:

  1. scene:     synthetic aerial scene — 8M SfM points over a 96x96 slab,
                GT rendered at 1280x800 from a 2M-Gaussian "true" cloud
                whose fine detail (sigma ~2 px) concentrates inside one
                block so that block legitimately needs >1M Gaussians;
  2. partition: the production partition CLI (threshold 500k -> 16 blocks
                of exactly 500k pts);
  3. train:     the detail block via the production train CLI — capacity
                2^21 slots, full 30k schedule, densify 1000..30000/200,
                appearance ON, auto max_per_tile; rolling checkpoints and
                resume-on-rerun;
  4. control:   the same block, densify disabled (the quality bar);
  5. eval:      held-out-view PSNR/SSIM/LPIPS (synthetic-weights LPIPS,
                labeled) + the step-time-vs-population curve and HBM
                stats from train_log.jsonl -> QUALITY_r03.json.

Usage (chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/quality_scale_run.py [--root /tmp/scale_scene]
    [--phase scene|partition|train|control|eval|all] [--iters 30000]
    [--smoke]   (smoke: 1500 iters, eval at 500/1500 — shape/HBM shakeout)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import pickle
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W, H = 1280, 800                 # 1.024 MP
FX = FY = 850.0
SLAB = 48.0                      # scene XY in [-SLAB, SLAB]
N_SFM = 8_000_000                # -> 16 blocks x 500k after median bisection
DETAIL_CENTER = np.array([12.0, 12.0])   # a block-center of the 4x4 split
DETAIL_R = 11.0
N_FINE = 1_300_000
N_COARSE = 700_000
N_CAMS_RING = 104                # over the detail block
N_CAMS_GRID = 56                 # across the rest of the slab
CAPACITY = 1 << 21
CAPACITY_CONTROL = 1 << 20
LLFFHOLD = 16
THRESHOLD = 500_000

# --- operating-point preset (env: PCP_QSR_PRESET) ---------------------
# "ref500k" (default): the 24 GB-tier contract above — 500k pts/block,
#   ~1MP, densify cap 2^21 (~8 h of chip for the 30k schedule).
# "ref100k": the reference's OTHER documented tier
#   (/root/reference/README.md:94-99: threshold_value 100_000 for 8 GB
#   GPUs), everything scaled with it — point counts and the densify cap
#   5x down (6M -> 1.2M ~ 2^20, train.py:146 scaling), render target
#   800x512 (0.41 MP; the tier statement fixes the point budget, not
#   resolution — recorded in the artifact). Exists so a
#   chip-hour-bounded session can complete the FULL 30,000-iteration
#   schedule (arguments/__init__.py:90) at a reference-documented
#   operating point instead of truncating the schedule at the 24 GB one.
PRESET = os.environ.get("PCP_QSR_PRESET", "ref500k")
if PRESET == "ref100k":
    W, H = 800, 512
    FX = FY = 531.0
    N_SFM = 1_600_000            # -> 16 blocks x 100k
    N_FINE = 260_000
    N_COARSE = 140_000
    CAPACITY = 1 << 20
    CAPACITY_CONTROL = 1 << 18
    THRESHOLD = 100_000


def spectral_colors(xyz, rng, n_freq=48):
    """Natural-image-like colors: a pink-spectrum mixture of random 3D
    sinusoids, wavelengths log-spaced from ~the slab down to ~4 px at the
    camera distance. Gradient-guided densification (the mechanism under
    test) needs GT with structure at ALL scales — uniform-random per-splat
    colors are white noise that photometric gradients cannot chase (the
    round-3 scale run collapsed 719k -> 15k alive on such a target)."""
    wavelengths = np.geomspace(24.0, 0.10, n_freq)
    freqs = (2 * np.pi / wavelengths)[:, None] * rng.normal(
        size=(n_freq, 3)).astype(np.float32)
    freqs /= np.linalg.norm(freqs / (2 * np.pi / wavelengths)[:, None],
                            axis=1, keepdims=True)
    phases = rng.uniform(0, 2 * np.pi, (n_freq, 1)).astype(np.float32)
    # pink-ish spectrum: amplitude ~ wavelength^0.45, normalized later
    amps = (wavelengths ** 0.45).astype(np.float32)
    mix = rng.normal(size=(n_freq, 3)).astype(np.float32) * amps[:, None]
    acc = np.zeros((xyz.shape[0], 3), np.float32)
    for k in range(n_freq):  # loop keeps peak memory ~ n x 3
        s = np.sin(xyz @ freqs[k] + phases[k])
        acc += s[:, None] * mix[k]
    acc /= 2.5 * np.std(acc)
    return np.clip(0.5 + acc, 0.02, 0.98).astype(np.float32)


def make_true_cloud(rng):
    """Fine detail inside the DETAIL disc + coarse splats elsewhere."""
    # fine: sigma ~ 2 px at the ~20-unit camera distance
    th = rng.uniform(0, 2 * np.pi, N_FINE)
    rr = DETAIL_R * np.sqrt(rng.uniform(0, 1, N_FINE))
    fine_xy = DETAIL_CENTER + np.stack([rr * np.cos(th), rr * np.sin(th)], 1)
    fine_z = rng.uniform(0.0, 2.5, N_FINE)
    fine_xyz = np.concatenate([fine_xy, fine_z[:, None]], 1)
    fine_scales = np.exp(rng.normal(np.log(0.05), 0.35, (N_FINE, 1))
                         ) * np.ones((1, 3))
    coarse_xy = rng.uniform(-SLAB, SLAB, (N_COARSE, 2))
    coarse_z = rng.uniform(0.0, 3.5, N_COARSE)
    coarse_xyz = np.concatenate([coarse_xy, coarse_z[:, None]], 1)
    coarse_scales = np.exp(rng.normal(np.log(0.35), 0.4, (N_COARSE, 1))
                           ) * np.ones((1, 3))
    xyz = np.concatenate([fine_xyz, coarse_xyz]).astype(np.float32)
    scales = np.concatenate([fine_scales, coarse_scales]).astype(np.float32)
    scales *= np.exp(rng.uniform(-0.3, 0.3, scales.shape)).astype(np.float32)
    n = xyz.shape[0]
    rgb = spectral_colors(xyz, rng)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    op = rng.uniform(0.55, 0.95, n).astype(np.float32)
    return xyz, rgb, scales, quats, op


def make_cameras(rng):
    """(pos, target) pairs: rings over the detail block + a slab grid."""
    cams = []
    for i in range(N_CAMS_RING):
        ring = i % 4
        r = 4.0 + 3.5 * ring
        ang = 2 * np.pi * (i // 4) / (N_CAMS_RING // 4) + 0.35 * ring
        pos = np.array([
            DETAIL_CENTER[0] + r * np.cos(ang),
            DETAIL_CENTER[1] + r * np.sin(ang),
            16.0 + 2.5 * ring,
        ])
        tgt = np.array([
            DETAIL_CENTER[0] + 0.35 * r * np.cos(ang + 2.2),
            DETAIL_CENTER[1] + 0.35 * r * np.sin(ang + 2.2),
            0.8,
        ])
        cams.append((pos, tgt))
    side = int(np.ceil(np.sqrt(N_CAMS_GRID)))
    k = 0
    for gy in range(side):
        for gx in range(side):
            if k >= N_CAMS_GRID:
                break
            k += 1
            pos = np.array([
                -SLAB + (2 * SLAB) * (gx + 0.5) / side + rng.uniform(-2, 2),
                -SLAB + (2 * SLAB) * (gy + 0.5) / side + rng.uniform(-2, 2),
                20.0 + rng.uniform(-2, 2),
            ])
            tgt = pos + np.array([rng.uniform(-6, 6), rng.uniform(-6, 6),
                                  -pos[2] + 0.5])
            cams.append((pos, tgt))
    return cams


def phase_scene(root, rng):
    from PIL import Image as PILImage

    import jax
    import jax.numpy as jnp

    from pcp_tpu.io import colmap
    from pcp_tpu.ops.projection import CameraIntrin
    from pcp_tpu.ops.rasterize import rasterize
    from pcp_tpu.utils.graphics import rotmat_to_qvec
    from pcp_tpu.utils.sh import rgb_to_sh
    from tests.synthetic import look_at_w2c

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    xyz, rgb, scales, quats, op = make_true_cloud(rng)
    sh = rgb_to_sh(jnp.asarray(rgb))[:, None, :]
    intrin = CameraIntrin(fx=jnp.float32(FX), fy=jnp.float32(FY),
                          cx=jnp.float32(W / 2), cy=jnp.float32(H / 2))
    xyz_j = jnp.asarray(xyz)
    scales_j = jnp.asarray(scales)
    quats_j = jnp.asarray(quats)
    op_j = jnp.asarray(op)
    bg = jnp.zeros(3)

    render = jax.jit(lambda vm: rasterize(
        xyz_j, scales_j, quats_j, op_j, sh, vm, intrin, (W, H), bg, 0,
        max_per_tile=4096)[0])

    cams = {1: colmap.Camera(1, "PINHOLE", W, H,
                             np.array([FX, FY, W / 2, H / 2]))}
    imgs = {}
    t0 = time.time()
    for i, (pos, tgt) in enumerate(make_cameras(rng)):
        R, t = look_at_w2c(pos, tgt)
        vm = np.eye(4, dtype=np.float32)
        vm[:3, :3] = R
        vm[:3, 3] = t
        img = np.clip(np.asarray(render(jnp.asarray(vm))), 0, 1)
        name = f"im{i:04d}.png"
        PILImage.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(root, "images", name))
        npts = 20
        imgs[i + 1] = colmap.Image(
            i + 1, rotmat_to_qvec(R), t, 1, name,
            xys=np.zeros((npts, 2)),
            point3D_ids=np.arange(npts, dtype=np.int64))
        if i % 20 == 0:
            print(f"  gt view {i} ({time.time() - t0:.0f}s)")

    # SfM sparse cloud: real COLMAP output lies ON surfaces and carries
    # photometric colors — sample the true cloud with jitter, colors =
    # true color + noise. (A uniform-random cloud with random colors is
    # ~all genuinely useless to the optimizer: the round-3 scale run
    # mass-extincted 719k of them at the first opacity reset.)
    pick = rng.integers(0, xyz.shape[0], N_SFM)
    sfm_xyz = (xyz[pick]
               + rng.normal(0, 0.05, (N_SFM, 3))).astype(np.float32)
    sfm_rgb = np.clip(
        rgb[pick] + rng.normal(0, 0.04, (N_SFM, 3)), 0, 1)
    sfm_rgb = (sfm_rgb * 255).astype(np.uint8)
    pts = colmap.Points3D.from_arrays(sfm_xyz, sfm_rgb)
    colmap.write_model(cams, imgs, pts, os.path.join(root, "sparse", "0"),
                       ext=".bin")
    print(f"scene written: {root} ({time.time() - t0:.0f}s, "
          f"{len(imgs)} cams, {N_SFM} sfm pts, {xyz.shape[0]} true gauss)")


def phase_partition(root):
    from pcp_tpu.cli import partition

    t0 = time.time()
    # visible_rate 0.1: the detail cameras ORBIT the fine disc at close
    # range (r 4..14.5 over an 11-unit disc), so each view clips most of
    # the block's hull — the reference's 0.45 default assumes the
    # high-altitude full-block views of an aerial capture. The small
    # quality scene's orbit uses 0.25 for the same reason.
    partition.main([root, "--threshold", str(THRESHOLD),
                    "--expansion_distance", "8", "--visible_rate", "0.1",
                    "--no_plots", "--llffhold", "83"])
    print(f"partition: {time.time() - t0:.1f}s")


def pick_block(root):
    """The block whose origin box contains DETAIL_CENTER."""
    with open(os.path.join(root, "model", "partition_data.pkl"), "rb") as f:
        records = pickle.load(f)
    for r in records:
        b = r.origin_box
        if (b.xmin <= DETAIL_CENTER[0] <= b.xmax
                and b.ymin <= DETAIL_CENTER[1] <= b.ymax):
            return r.partition_id
    raise RuntimeError("no block contains the detail center")


def _train_block(root, block_id, out_name, iters, densify, capacity,
                 test_iters, seed=0):
    # In-loop held-out evals use the batched vmapped render; on the r4
    # quality run its first compile (iter 1000) CRASHED the TPU worker
    # ("kernel fault") and wedged the chip for ~everything after. The
    # artifact's quality numbers come from the final eval phase (separate
    # process, per-view non-vmapped render) and its curves from
    # train_log.jsonl, so the in-loop evals are optional: PCP_QSR_NO_EVAL=1
    # (default) drops them; set 0 to restore.
    if os.environ.get("PCP_QSR_NO_EVAL", "1") == "1":
        test_iters = []
    from pcp_tpu.cli import train as train_cli

    block_dir = os.path.join(root, "model", "split_result", "visible",
                             block_id, f"partition_{block_id}")
    out_dir = os.path.join(block_dir, out_name)
    # every 2000: the chip tunnel wedged twice in the first 3 h of the r4
    # run (futex-stuck client, ~15 min recovery); a 4000-iter checkpoint
    # grid lost ~45 min of training per wedge
    ckpt_iters = [i for i in range(2000, iters, 2000)]
    # dense early PLY snapshots: a wall-clock-killed run must still leave
    # a renderable model well before the first 5k boundary
    save_iters = sorted({1000, 2000, 3000, 4000, 5000, 6000, 8000}
                        | set(range(10_000, iters + 1, 5000)) | {iters})
    save_iters = [i for i in save_iters if i <= iters]
    argv = [
        "-s", block_dir, "-m", out_dir,
        "--iterations", str(iters),
        "--capacity", str(capacity),
        "--max_per_tile", "0",
        "--resolution", "1",
        "--eval", "--llffhold", str(LLFFHOLD),
        "--disable_viewer",
        "--seed", str(seed),
        "--save_iterations", *[str(i) for i in save_iters],
    ]
    # "0" = never (the loop is 1-based); omitting the flag would fall back
    # to the CLI default [7000, 30000] and re-arm the crash
    argv += ["--test_iterations",
             *([str(i) for i in test_iters] if test_iters else ["0"])]
    if ckpt_iters:
        argv += ["--checkpoint_iterations", *[str(i) for i in ckpt_iters]]
    if densify:
        # the reference cadence (arguments/__init__.py:96-99): densify
        # 500..15000 every 100; population then frozen for pure refinement
        argv += ["--densify_from_iter", "500",
                 "--densify_until_iter", str(min(15_000, iters)),
                 "--densification_interval", "100",
                 "--opacity_reset_interval", "3000"]
    else:
        argv += ["--densify_from_iter", str(10 * iters)]
    # resume from the newest checkpoint if a prior run died mid-way
    ckpts = sorted(glob.glob(os.path.join(out_dir, "chkpnt*.npz")),
                   key=lambda p: int(
                       os.path.basename(p)[len("chkpnt"):-len(".npz")]))
    if ckpts:
        argv += ["--start_checkpoint", ckpts[-1]]
        print(f"resuming {out_name} from {ckpts[-1]}")
    t0 = time.time()
    train_cli.main(argv)
    return out_dir, (time.time() - t0) / 60.0


def hbm_stats():
    try:
        import jax

        s = jax.local_devices()[0].memory_stats()
        if not s:  # axon returns None rather than raising
            return {"unavailable": True}
        return {"bytes_in_use": int(s.get("bytes_in_use", -1)),
                "peak_bytes_in_use": int(s.get("peak_bytes_in_use", -1)),
                "bytes_limit": int(s.get("bytes_limit", -1))}
    except Exception:  # axon plugin may not expose memory_stats
        return {"unavailable": True}


def phase_eval(root, block_id, variants, out_json):
    """Render held-out views from each variant's final PLY + metrics."""
    import jax
    import jax.numpy as jnp

    def heartbeat(note):
        # progress marker for the watchdog's non-train stall detector
        # (phase_eval writes its artifact only at the END; without this
        # a long eval looks stalled and gets SIGKILLed)
        with open(os.path.join(root, "eval_heartbeat.json"), "w") as hf:
            json.dump({"at": time.time(), "note": note}, hf)

    from pcp_tpu.eval.metrics import evaluate_images
    from pcp_tpu.io.ply import load_gaussian_ply
    from pcp_tpu.models import gaussians as G
    from pcp_tpu.ops.rasterize import rasterize
    from pcp_tpu.scene import cameras as cam_mod
    from pcp_tpu.scene import load_scene
    from pcp_tpu.scene.dataset import split_train_test

    lpips_npz = os.path.join(root, "lpips_synth.npz")
    if not os.path.exists(lpips_npz):
        from tools.make_lpips_weights import synthetic_bundle

        np.savez(lpips_npz, **synthetic_bundle(0))

    block_dir = os.path.join(root, "model", "split_result", "visible",
                             block_id, f"partition_{block_id}")
    scene = load_scene(block_dir, eval_split=True)
    _, test_infos = split_train_test(scene.cameras, True, LLFFHOLD)
    test_cams = [cam_mod.from_info(i, 1) for i in test_infos]
    print(f"eval: {len(test_cams)} held-out views")

    # ONE jitted render shared by every snapshot: arrays enter as
    # ARGUMENTS (a fresh closure per snapshot would recompile the heavy
    # 1MP/2^20 render each time — measured ~13 min per remote compile,
    # which is how the first r4 eval attempt died)
    @jax.jit
    def _render_j(xyz, scales_a, rot, op, sh, vm, intr):
        return rasterize(xyz, scales_a, rot, op, sh, vm, intr, (W, H),
                         jnp.zeros(3), 3, max_per_tile=4096)[0]

    def eval_snapshot(ply_path, full=True):
        """PSNR/SSIM(/LPIPS when full) of one PLY over the held-out views.

        Pads the Gaussian axis to the next power of two (pad rows sit far
        outside every frustum, so they cull to nothing) — snapshots of
        different populations then share a couple of compiled render
        shapes instead of one ~13 min tunnel compile each."""
        g = load_gaussian_ply(ply_path)
        n = g["xyz"].shape[0]
        # ONE pad size for every snapshot: populations from 100k to 1.5M
        # would otherwise land in 4-5 pow2 buckets, each a ~10 min remote
        # compile of the 1MP render — padding everything to the run
        # capacity costs pennies per render and compiles once
        n_pad = max(CAPACITY, 1 << max(int(np.ceil(np.log2(max(n, 1)))), 10))
        pad = n_pad - n

        def p(a, fill=0.0):
            return jnp.asarray(np.concatenate(
                [a, np.full((pad,) + a.shape[1:], fill, a.dtype)])
                if pad else a)

        xyz_j = jnp.asarray(np.concatenate(
            [g["xyz"], np.tile([[0.0, 0.0, -1e6]], (pad, 1)).astype(
                g["xyz"].dtype)]) if pad else g["xyz"])
        sh = jnp.concatenate(
            [p(g["f_dc"]), p(g["f_rest"])], axis=1)
        scales_a = G.scaling_act(p(g["scaling"], -10.0))
        op_a = G.opacity_act(p(g["opacity"], -10.0))[:, 0]
        rot_j = p(g["rotation"])
        renders, gts = [], []
        for cam in test_cams:
            vm, intr = cam_mod.camera_device_arrays(cam)
            renders.append(np.clip(np.asarray(_render_j(
                xyz_j, scales_a, rot_j, op_a, sh, vm, intr)), 0, 1))
            gts.append(np.asarray(cam.gt_image))
        res = evaluate_images(
            renders, gts, lpips_weights=lpips_npz if full else None)
        return n, res, renders

    rows = []
    final_renders_by_variant = {}
    for name, out_dir, wall_min, iters in variants:
        # latest snapshot at or below the scheduled end (a killed run
        # reports its actual reached iteration honestly)
        snaps = sorted(
            (int(os.path.basename(d)[len("iteration_"):]), d)
            for d in glob.glob(os.path.join(out_dir, "point_cloud",
                                            "iteration_*"))
            if int(os.path.basename(d)[len("iteration_"):]) <= iters)
        # quality-vs-iteration curve from the SAVED snapshots (replaces
        # the in-loop evals dropped after the vmapped-eval worker crash;
        # runs in this separate process on the per-view render path)
        snap_curve = []
        for it_s, d_s in snaps[:-1]:
            heartbeat(f"{name} snapshot {it_s}")
            try:
                n_s, res_s, _ = eval_snapshot(
                    os.path.join(d_s, "point_cloud.ply"), full=False)
                snap_curve.append({
                    "iter": it_s, "alive": int(n_s),
                    "PSNR": res_s["mean"]["PSNR"],
                    "SSIM": res_s["mean"]["SSIM"]})
                print(json.dumps({"snapshot": it_s, **snap_curve[-1]}))
            except Exception as e:
                print(f"  snapshot {it_s}: eval failed ({e}); skipped")
        if not snaps:
            print(f"skip {name}: no PLY snapshot under {out_dir}")
            continue
        # a wall-clock kill can truncate the newest PLY: fall back
        res = None
        while snaps:
            iters = snaps[-1][0]
            ply = os.path.join(snaps[-1][1], "point_cloud.ply")
            try:
                n_alive, res, final_renders = eval_snapshot(ply, full=True)
                break
            except Exception as e:
                print(f"  snapshot {iters} unreadable ({e}); falling back")
                snaps.pop()
        if res is None:
            print(f"skip {name}: no readable PLY under {out_dir}")
            continue

        # step-time / population curve from the training JSONL. The log
        # is APPENDED across watchdog relaunches, so the same iteration
        # can appear several times — keep the LAST occurrence (the run
        # that actually carried the state forward) and sort by iter.
        # Wall minutes likewise accumulate across relaunches: sum the
        # inter-row timestamp deltas, capping any single gap at 5 min so
        # tunnel-wedge recoveries don't count as training time.
        by_iter = {}
        measured_wall_s = 0.0
        prev_ts = None
        log_p = os.path.join(out_dir, "train_log.jsonl")
        if os.path.exists(log_p):
            for ln in open(log_p):
                r = json.loads(ln)
                if "ts" in r:
                    if prev_ts is not None:
                        measured_wall_s += min(max(r["ts"] - prev_ts, 0.0),
                                               300.0)
                    prev_ts = r["ts"]
                if "total_points" in r and r["step"] % 1000 == 0:
                    by_iter[r["step"]] = {
                        "iter": r["step"],
                        "alive": int(r["total_points"]),
                        "step_ms": round(1000 * r.get("iter_time", 0), 1),
                        "n_pairs": int(r.get("n_pairs", 0)),
                    }
        curve = [by_iter[k] for k in sorted(by_iter)]
        if wall_min < 0 and measured_wall_s > 0:
            wall_min = measured_wall_s / 60.0
        evals = {}
        for p in glob.glob(os.path.join(out_dir, "eval_*.json")):
            it = os.path.basename(p)[len("eval_"):-len(".json")]
            evals[it] = json.load(open(p))
        final_renders_by_variant[name] = final_renders
        rows.append({
            "variant": name,
            "iterations": iters,
            "alive_final": n_alive,
            "max_alive": max([c["alive"] for c in curve], default=n_alive),
            "PSNR": res["mean"]["PSNR"],
            "SSIM": res["mean"]["SSIM"],
            "LPIPS": res["mean"]["LPIPS"],
            "lpips_weights": "synthetic (plumbing stand-in; values not "
                             "comparable to published LPIPS)",
            "wall_minutes": round(wall_min, 1),
            "in_loop_evals": evals,
            "snapshot_curve": snap_curve,
            "population_curve": curve,
        })
        print(json.dumps({k: rows[-1][k] for k in
                          ("variant", "alive_final", "PSNR", "SSIM",
                           "LPIPS")}))

    # --- oracle-GT decircularization (round-5 item 5): score the final
    # renders against GT produced by the DENSE oracle renderer
    # (ops/oracle.rasterize_dense_jax — validated against the literal
    # numpy CUDA replay; shares only the closed-form projection with the
    # production path, never the tiled composite kernel). Full 30k-view
    # GT through the oracle is minutes per view, so a decimated subset
    # of held-out views carries the claim; the main table stays on the
    # production-rendered GT pngs for comparability with r2-r4.
    oracle_sec = {"provenance": "ops/oracle.rasterize_dense_jax over the "
                                f"true {N_FINE + N_COARSE}-Gaussian "
                                "cloud (seed 31), "
                                "tile-rect + CUDA skip/early-stop "
                                "semantics; independent of the "
                                "production tiled composite"}
    try:
        n_ov = int(os.environ.get("PCP_ORACLE_VIEWS", "4"))
        if n_ov > 0 and final_renders_by_variant:
            from pcp_tpu.ops.oracle import rasterize_dense_jax
            from pcp_tpu.ops.projection import CameraIntrin
            from pcp_tpu.utils.sh import rgb_to_sh

            import jax.numpy as _jnp

            rng_o = np.random.default_rng(31)
            xyz_t, rgb_t, scales_t, quats_t, op_t = make_true_cloud(rng_o)
            sh_t = np.asarray(rgb_to_sh(_jnp.asarray(rgb_t)))[:, None, :]
            intr_o = CameraIntrin(
                fx=_jnp.float32(FX), fy=_jnp.float32(FY),
                cx=_jnp.float32(W / 2), cy=_jnp.float32(H / 2))
            step = max(1, len(test_cams) // n_ov)
            idxs = list(range(0, len(test_cams), step))[:n_ov]
            oracle_gt = []
            for i in idxs:
                heartbeat(f"oracle view {i}")
                t0o = time.time()
                og, _ = rasterize_dense_jax(
                    xyz_t, scales_t, quats_t, op_t, sh_t,
                    np.asarray(test_cams[i].viewmat), intr_o, (W, H),
                    np.zeros(3, np.float32), 0)
                oracle_gt.append(np.clip(og, 0, 1))
                print(f"  oracle GT view {i}: {time.time()-t0o:.0f}s")
            png_gt = [np.asarray(test_cams[i].gt_image) for i in idxs]
            bias = evaluate_images(png_gt, oracle_gt, lpips_weights=None)
            oracle_sec["views"] = idxs
            oracle_sec["production_gt_vs_oracle_gt"] = {
                "PSNR": bias["mean"]["PSNR"], "SSIM": bias["mean"]["SSIM"]}
            per_v = {}
            for nm, rnds in final_renders_by_variant.items():
                rv = evaluate_images(
                    [rnds[i] for i in idxs], oracle_gt, lpips_weights=None)
                per_v[nm] = {"PSNR": rv["mean"]["PSNR"],
                             "SSIM": rv["mean"]["SSIM"]}
            oracle_sec["per_variant"] = per_v
            print(json.dumps({"oracle_gt": oracle_sec}, default=float))
    except Exception as e:  # the main table must survive an oracle failure
        oracle_sec["error"] = f"{type(e).__name__}: {e}"

    out = {
        "oracle_gt": oracle_sec,
        "workload": {
            "preset": f"{PRESET} (threshold {THRESHOLD} pts/block; "
                      "ref100k = the reference's 8 GB-GPU tier, "
                      "README.md:94-99, densify cap scaled 5x with it)",
            "scene": f"synthetic aerial {N_SFM} SfM pts over "
                     f"{2*SLAB:.0f}x{2*SLAB:.0f}, GT from "
                     f"{N_FINE + N_COARSE} true Gaussians, {W}x{H} "
                     f"({W*H/1e6:.2f} MP)",
            "block": block_id,
            "schedule": "densify 500..15000 every 100, opacity reset "
                    "3000, appearance ON, capacity "
                    f"{CAPACITY} (control {CAPACITY_CONTROL}, no densify); "
                    "per-variant iteration counts in runs[] (a variant "
                    "whose run was wall-clock-bounded reports the "
                    "iteration its newest readable snapshot reached)",
            "reference_bar": "500k-pt block, 30k iters, ~1MP, densify "
                             "toward multi-M Gaussians "
                             "(shen_partition_utils.py:125, "
                             "arguments/__init__.py:90, train.py:146)",
        },
        "hbm": hbm_stats(),
        "runs": rows,
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": out_json}))


def main():
    # at 2^21-slot capacity the default 8-view vmapped eval batch would
    # multiply the binning workspace past HBM (train/loop.py PCP_EVAL_BATCH)
    os.environ.setdefault("PCP_EVAL_BATCH", "1")
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/scale_scene")
    ap.add_argument("--phase", default="all",
                    choices=["scene", "partition", "train", "control",
                             "eval", "all"])
    ap.add_argument("--iters", type=int, default=30_000)
    ap.add_argument("--control_iters", type=int, default=0,
                    help="no-densify control schedule (0 = same as --iters); "
                    "the control's fixed 500k-point population converges "
                    "long before 30k — its in-loop eval curve in the "
                    "artifact shows the plateau that justifies a shorter "
                    "schedule when chip time is contended")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "QUALITY_r05.json"))
    args = ap.parse_args()

    iters = 1500 if args.smoke else args.iters
    c_iters = args.control_iters or iters
    if args.smoke:
        c_iters = iters
    test_iters = ([500, 1500] if args.smoke
                  else sorted({1000, 3000, 5000, 7000, 15000, iters}))
    test_iters_c = ([500, 1500] if args.smoke else sorted(
        {i for i in (1000, 2500, 5000, 7000, 8500, 15000, c_iters)
         if i <= c_iters}))
    rng = np.random.default_rng(31)
    root = args.root
    phases = ([args.phase] if args.phase != "all"
              else ["scene", "partition", "train", "control", "eval"])

    if "scene" in phases and not os.path.isdir(
            os.path.join(root, "sparse")):
        os.makedirs(root, exist_ok=True)
        phase_scene(root, rng)
    if "partition" in phases and not os.path.exists(
            os.path.join(root, "model", "partition_data.pkl")):
        phase_partition(root)

    if not any(ph in phases for ph in ("train", "control", "eval")):
        return
    block_id = pick_block(root)
    print(f"detail block: {block_id}")
    timings = {}
    suffix = "_smoke" if args.smoke else ""
    if "train" in phases:
        out_dir, mins = _train_block(
            root, block_id, f"output_densify{suffix}", iters, True,
            CAPACITY, test_iters)
        timings["densify"] = (out_dir, mins)
        print(f"train done in {mins:.1f} min; hbm {hbm_stats()}")
    if "control" in phases:
        out_dir, mins = _train_block(
            root, block_id, f"output_control{suffix}", c_iters, False,
            CAPACITY_CONTROL, test_iters_c)
        timings["control"] = (out_dir, mins)
        print(f"control done in {mins:.1f} min")
    if "eval" in phases:
        block_dir = os.path.join(root, "model", "split_result", "visible",
                                 block_id, f"partition_{block_id}")
        variants = []
        for name, key, it_v in [("densify", "densify", iters),
                                ("no_densify_control", "control", c_iters)]:
            od = os.path.join(
                block_dir,
                f"output_{'densify' if key == 'densify' else 'control'}"
                f"{suffix}")
            mins = timings.get(key, (None, -1))[1]
            if os.path.isdir(od):
                variants.append((name, od, mins, it_v))
        phase_eval(root, block_id, variants,
                   args.out if not args.smoke
                   else os.path.join(root, "QUALITY_smoke.json"))


if __name__ == "__main__":
    main()
