"""Intra-block Gaussian-axis sharding on the 8-virtual-device CPU mesh:
the sharded render must match the single-device render, and the ZeRO-style
step must reduce the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.models import gaussians as G
from pcp_tpu.ops.projection import CameraIntrin
from pcp_tpu.parallel.intra_block import (
    gauss_mesh,
    make_sharded_render,
    make_sharded_train_step,
    shard_params,
)
from pcp_tpu.train.config import OptimConfig
from pcp_tpu.train.step import render_gaussians

W, H = 64, 64  # 4x4 tiles; 8 devices -> 1 tile-row band each (padded)


def _setup(rng, n=96, cap=256):
    xyz = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(2, 6, n)], -1,
    ).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    params, alive = G.create_from_pcd(
        xyz, rgb, G.GaussianConfig(sh_degree=3, capacity=cap)
    )
    intrin = CameraIntrin(
        fx=jnp.float32(50.0), fy=jnp.float32(50.0),
        cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
    )
    return params, alive, intrin


def test_sharded_render_matches_single_device(rng):
    params, alive, intrin = _setup(rng)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    viewmat = jnp.eye(4)

    ref, _ = render_gaussians(
        params, alive, viewmat, intrin, (W, H), bg, 3,
        max_per_tile=128, max_pairs=1 << 14,
    )

    mesh = gauss_mesh(8)
    p_sh, a_sh = shard_params(params, alive, mesh)
    render = make_sharded_render(mesh, (W, H), 3, max_per_tile=128,
                                 pairs_per_gaussian=64)
    img = render(p_sh, a_sh, viewmat, intrin, bg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=3e-5)


def test_sharded_train_step_reduces_loss(rng):
    params, alive, intrin = _setup(rng)
    bg = jnp.zeros(3)
    viewmat = jnp.eye(4)
    # target: a render from perturbed params
    gt, _ = render_gaussians(
        params, alive, viewmat, intrin, (W, H), bg, 0,
        max_per_tile=128, max_pairs=1 << 14,
    )
    gt = jnp.clip(gt, 0, 1)

    mesh = gauss_mesh(8)
    noisy = dict(params)
    noisy["f_dc"] = params["f_dc"] + 0.3
    p_sh, a_sh = shard_params(noisy, alive, mesh)
    from pcp_tpu.train import optim

    opt = optim.init_adam(p_sh)
    ocfg = OptimConfig(pairs_per_gaussian=64)
    step = make_sharded_train_step(mesh, ocfg, (W, H), max_per_tile=128)

    losses = []
    for _ in range(30):
        p_sh, opt, loss = step(
            p_sh, opt, a_sh, viewmat, intrin, gt, bg, jnp.float32(3.0), 0
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    # params stayed sharded (no silent replication)
    shard_shapes = {s.data.shape for s in p_sh["xyz"].addressable_shards}
    assert shard_shapes == {(256 // 8, 3)}


def test_sharded_full_trainer_with_densify(rng):
    """The FULL intra-block trainer: appearance net + densify stats + a
    shard-local densify/prune pass; loss decreases and the population can
    grow while everything stays sharded."""
    from pcp_tpu.models.appearance import init_appearance
    from pcp_tpu.parallel.intra_block import (
        balance_for_sharding,
        make_sharded_densify,
        make_sharded_train_step_full,
        shard_tree,
    )
    from pcp_tpu.train import optim
    from pcp_tpu.train.step import TrainState

    params, alive, intrin = _setup(rng)
    bg = jnp.zeros(3)
    viewmat = jnp.eye(4)
    gt, _ = render_gaussians(
        params, alive, viewmat, intrin, (W, H), bg, 0,
        max_per_tile=128, max_pairs=1 << 14,
    )
    gt = jnp.clip(gt, 0, 1)

    mesh = gauss_mesh(8)
    noisy = dict(params)
    noisy["f_dc"] = params["f_dc"] + 0.3
    # balance alive across shards so every shard has clone-target free slots
    noisy, alive_b = balance_for_sharding(noisy, alive, 8)
    p_sh, a_sh = shard_params(noisy, alive_b, mesh)
    app = init_appearance(jax.random.PRNGKey(2), (W, H))
    state = TrainState(
        params=p_sh, app=app,
        opt_g=shard_tree(optim.init_adam(p_sh), mesh),
        opt_a=optim.init_adam(app),
        alive=a_sh,
        stats=shard_tree(G.init_densify_stats(256), mesh),
    )
    ocfg = OptimConfig(capacity=256, max_per_tile=128, pairs_per_gaussian=64,
                       densify_grad_threshold=0.0)
    step = make_sharded_train_step_full(mesh, ocfg, (W, H),
                                        use_appearance=True)
    losses = []
    for _ in range(25):
        state, m = step(state, viewmat, intrin, gt, jnp.int32(0), bg,
                        jnp.float32(3.0), 0)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]

    alive_before = int(np.asarray(state.alive).sum())
    densify = make_sharded_densify(mesh, ocfg)
    state = densify(state, jax.random.PRNGKey(5), jnp.float32(3.0), False)
    alive_after = int(np.asarray(state.alive).sum())
    assert alive_after > alive_before  # threshold 0 clones every visible one
    # still sharded after densify (no silent replication)
    shard_shapes = {s.data.shape for s in state.params["xyz"].addressable_shards}
    assert shard_shapes == {(256 // 8, 3)}
    # densify stats were reset
    assert float(np.asarray(state.stats["denom"]).sum()) == 0.0


def test_sharded_trainer_checkpoint_resume(tmp_path):
    """Durability of the intra-block trainer: a run that stops after its
    rolling checkpoint resumes from chkpnt_sharded.npz (not from scratch)
    and finishes the schedule — with TB/JSONL scalars and a held-out eval
    along the way (fleet-path parity, VERDICT round-2 item 6)."""
    import os

    from tests.synthetic import write_synthetic_scene

    from pcp_tpu.parallel.intra_block import gauss_mesh, train_scene_sharded
    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train.config import (
        ModelConfig,
        OptimConfig,
        PipelineConfig,
        TrainRunConfig,
    )

    scene_dir = tmp_path / "scene"
    write_synthetic_scene(str(scene_dir), np.random.default_rng(7),
                          n_points=80, n_cams=9)
    scene = load_colmap_scene(str(scene_dir))
    out = str(tmp_path / "out")

    def make_cfg(iters):
        return TrainRunConfig(
            model=ModelConfig(source_path=str(scene_dir), model_path=out,
                              resolution=1, sh_degree=3, eval=True,
                              llffhold=9),
            optim=OptimConfig(
                iterations=iters, capacity=256, max_per_tile=128,
                pairs_per_gaussian=64,
                densify_from_iter=10, densification_interval=10,
                densify_until_iter=iters, opacity_reset_interval=10_000,
            ),
            pipeline=PipelineConfig(use_appearance=False),
            test_iterations=[iters],
            save_iterations=[],
        )

    mesh = gauss_mesh(8)
    logs = []
    # leg 1: "killed" right after the iter-20 rolling checkpoint
    train_scene_sharded(scene, make_cfg(20), mesh, checkpoint_every=10,
                        log_fn=logs.append)
    ck = os.path.join(out, "chkpnt_sharded.npz")
    assert os.path.exists(ck)
    assert not any("resumed" in l for l in logs)

    # leg 2: re-entry resumes at 20 and completes 40
    state = train_scene_sharded(scene, make_cfg(40), mesh,
                                checkpoint_every=10, log_fn=logs.append)
    assert any("resumed" in l and "iter 20" in l for l in logs), logs[:5]
    assert any("[eval 40]" in l for l in logs), logs
    assert os.path.exists(
        os.path.join(out, "point_cloud", "iteration_40", "point_cloud.ply"))
    # JSONL observability accumulated across both legs
    steps = [__import__("json").loads(ln)["step"]
             for ln in open(os.path.join(out, "train_log.jsonl"))]
    assert min(steps) == 1 and max(steps) == 40
    assert np.isfinite(np.asarray(state.params["xyz"])).all()


def test_sharded_reactive_retune_fixes_saturation(tmp_path, monkeypatch):
    """The intra-block trainer's reactive re-tune (the sharded port of the
    fleet's, parallel/intra_block.py _autosize_k): a crippled init
    geometry (k=128 below the scene's real load) must trigger a
    saturation warning, a forced re-tune at the next iteration whose
    REAL measurement adopts a covering k, and a saturation-free tail —
    mirrors test_fleet_autosize::test_fleet_reactive_retune_fixes_saturation
    one layer down (round-4 verdict weak #3)."""
    from tests.synthetic import write_synthetic_scene

    from pcp_tpu.ops import binning as binning_mod
    from pcp_tpu.parallel.intra_block import gauss_mesh, train_scene_sharded
    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train.config import (
        ModelConfig,
        OptimConfig,
        PipelineConfig,
        TrainRunConfig,
    )

    scene_dir = tmp_path / "scene"
    # a dense close-ring scene: per-band-tile loads far above 128
    write_synthetic_scene(str(scene_dir), np.random.default_rng(3),
                          n_points=600, n_cams=6, W=64, H=48, radius=2.0)
    scene = load_colmap_scene(str(scene_dir))

    real_cap_fit = binning_mod._cap_fit
    calls = []

    def crippled_first(maxload, cap, chunk):
        calls.append(int(maxload))
        if len(calls) == 1:
            return 128
        return real_cap_fit(maxload, cap, chunk)

    monkeypatch.setattr(binning_mod, "_cap_fit", crippled_first)
    monkeypatch.setenv("PCP_RETUNE", "0")       # reactive path only

    cfg = TrainRunConfig(
        model=ModelConfig(source_path=str(scene_dir),
                          model_path=str(tmp_path / "out"), resolution=1,
                          sh_degree=1),
        optim=OptimConfig(
            iterations=210, capacity=1024, max_per_tile=0,
            pairs_per_gaussian=64, densify_from_iter=10_000,
        ),
        pipeline=PipelineConfig(use_appearance=False),
        test_iterations=[], save_iterations=[],
    )
    logs = []
    train_scene_sharded(scene, cfg, gauss_mesh(4), log_fn=logs.append)
    joined = "\n".join(logs)
    assert "auto max_per_tile (init) -> 128" in joined, logs[:4]
    assert "per-tile saturation" in joined
    assert "[retune] sharded iter" in joined
    assert len(calls) >= 2
    tail = joined.split("[retune] sharded iter", 1)[1]
    assert "per-tile saturation" not in tail
