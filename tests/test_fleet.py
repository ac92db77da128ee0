"""Block-parallel fleet over the 8-virtual-device CPU mesh.

Key contract (SURVEY §4): block independence is exact — a block trained in
the fleet must match the same block trained alone, step for step, because
there is no cross-block communication.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcp_tpu.parallel import (
    block_mesh,
    make_fleet_step,
    pad_blocks,
    stack_states,
    train_blocks_parallel,
    unstack_state,
)
from pcp_tpu.parallel.fleet import shard_fleet
from pcp_tpu.ops.projection import CameraIntrin
from pcp_tpu.train.config import (
    ModelConfig,
    OptimConfig,
    PipelineConfig,
    TrainRunConfig,
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from tests.synthetic import write_synthetic_scene

    d = tmp_path_factory.mktemp("fscene")
    write_synthetic_scene(str(d), np.random.default_rng(11), n_points=120, n_cams=8)
    return str(d)


def _cfg():
    return TrainRunConfig(
        model=ModelConfig(resolution=1),
        optim=OptimConfig(capacity=128, max_per_tile=128),
        pipeline=PipelineConfig(use_appearance=False),
    )


def test_fleet_matches_single_block(synth):
    from pcp_tpu.scene import cameras as cam_mod
    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train.loop import init_state
    from pcp_tpu.train.step import make_train_step

    cfg = _cfg()
    scene = load_colmap_scene(synth)
    cams = [cam_mod.from_info(i, 1) for i in scene.cameras]
    w, h = cams[0].width, cams[0].height
    state0 = init_state(scene, cfg, (w, h), jax.random.PRNGKey(0))

    # Build (stack) the fleet BEFORE the single-block run: the jitted steps
    # donate their input state, so state0's buffers die on first use.
    mesh = block_mesh(4)
    fleet = pad_blocks([state0] * 4, [scene.extent] * 4, 4)
    fleet = shard_fleet(fleet, mesh)

    # single-block reference: 4 steps over cameras 0..3
    step1 = make_train_step(cfg.optim, (w, h), scene.extent, use_appearance=False)
    bg = jnp.zeros(3)
    s_single = state0
    for i in range(4):
        vm, intr = cam_mod.camera_device_arrays(cams[i])
        s_single, _ = step1(
            s_single, vm, intr, jnp.asarray(cams[i].gt_image),
            jnp.int32(cams[i].uid), bg, 0,
        )

    # fleet of 4 copies of the same block, each fed a *different* camera per
    # step, rotated so block b sees camera (i + b) % 4 at step i.
    fstep = make_fleet_step(cfg.optim, (w, h), mesh, use_appearance=False)
    for i in range(4):
        order = [(i + b) % 4 for b in range(4)]
        viewmats = jnp.asarray(np.stack([cams[j].viewmat for j in order]))
        intr = CameraIntrin(
            fx=jnp.asarray([cams[j].fx for j in order], jnp.float32),
            fy=jnp.asarray([cams[j].fy for j in order], jnp.float32),
            cx=jnp.asarray([cams[j].width / 2.0 for j in order], jnp.float32),
            cy=jnp.asarray([cams[j].height / 2.0 for j in order], jnp.float32),
        )
        gts = jnp.asarray(np.stack([cams[j].gt_image for j in order]))
        uids = jnp.asarray([cams[j].uid for j in order], jnp.int32)
        whs = jnp.asarray([(cams[j].width, cams[j].height) for j in order],
                          jnp.int32)
        fleet, metrics = fstep(fleet, viewmats, intr, gts, uids, whs, bg, 0)

    # block 0 saw cameras 0,1,2,3 in order == the single-block run
    host = jax.device_get(fleet)
    blk0 = unstack_state(host.state, 0)
    np.testing.assert_allclose(
        np.asarray(blk0.params["xyz"]), np.asarray(s_single.params["xyz"]),
        rtol=2e-4, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(blk0.params["opacity"]),
        np.asarray(s_single.params["opacity"]), rtol=2e-4, atol=2e-6,
    )


def test_train_blocks_parallel_e2e(synth, tmp_path):
    from pcp_tpu.partition.pipeline import PartitionConfig, run_partition
    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train.loop import evaluate_cameras
    from pcp_tpu.scene import cameras as cam_mod

    scene = load_colmap_scene(synth)
    records = run_partition(
        scene, str(tmp_path / "model"),
        PartitionConfig(threshold=40, expansion_distance=10.0,
                        visible_rate=0.05, remove_outliers=False,
                        make_plots=False),
        export=True, save_test=False,
    )
    # load block scenes back from the exported COLMAP datasets
    import os

    block_scenes = []
    for r in records:
        if not r.camera_uids:
            continue
        block_dir = os.path.join(
            str(tmp_path / "model"), "split_result", "visible",
            r.partition_id, f"partition_{r.partition_id}",
        )
        block_scenes.append(load_colmap_scene(block_dir))
    assert len(block_scenes) >= 2

    cfg = _cfg()
    cfg.optim.iterations = 60
    cfg.optim.densify_from_iter = 10_000  # off for this smoke test
    states = train_blocks_parallel(
        block_scenes, cfg, mesh=block_mesh(4), log_fn=None
    )
    assert len(states) == len(block_scenes)

    # each block's render of its own first camera should beat init quality
    from pcp_tpu.train.loop import init_state

    bg = jnp.zeros(3)
    improved = 0
    for scene_b, st in zip(block_scenes, states):
        cams = [cam_mod.from_info(i, 1) for i in scene_b.cameras][:1]
        st0 = init_state(scene_b, cfg, (cams[0].width, cams[0].height),
                         jax.random.PRNGKey(1))
        before = evaluate_cameras(st0, cams, 0, bg, cfg.optim)
        after = evaluate_cameras(st, cams, 0, bg, cfg.optim)
        improved += after["psnr"] > before["psnr"]
    assert improved >= max(1, len(block_scenes) - 1)


def test_fleet_banked_matches_host_fed(synth, tmp_path):
    """device-resident camera banks must produce the same training as the
    host-fed path given the same camera sequence."""
    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.parallel import train_blocks_parallel

    scene = load_colmap_scene(synth)
    cfg = _cfg()
    cfg.optim.iterations = 20
    cfg.optim.densify_from_iter = 10_000
    scenes = [scene, scene]
    a = train_blocks_parallel(scenes, cfg, mesh=block_mesh(2), log_fn=None,
                              seed=3, device_data=False)
    b = train_blocks_parallel(scenes, cfg, mesh=block_mesh(2), log_fn=None,
                              seed=3, device_data=True)
    for sa, sb in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(sa.params["xyz"]), np.asarray(sb.params["xyz"]),
            rtol=1e-5, atol=1e-7,
        )


def test_fleet_checkpoint_resume(synth, tmp_path):
    """Durability contract: a fleet interrupted after its rolling
    checkpoints resumes via resume=True and finishes WITHOUT restarting
    from zero (train.py:160-162 parity for the fleet path)."""
    import json
    import os

    from pcp_tpu.parallel.fleet import FLEET_CKPT_NAME
    from pcp_tpu.partition.pipeline import PartitionConfig, run_partition
    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train import checkpoint as ckpt
    from pcp_tpu.train.loop import init_state

    scene = load_colmap_scene(synth)
    records = run_partition(
        scene, str(tmp_path / "model"),
        PartitionConfig(threshold=40, expansion_distance=10.0,
                        visible_rate=0.05, remove_outliers=False,
                        make_plots=False),
        export=True, save_test=False,
    )
    block_scenes, block_dirs, block_ids = [], [], []
    for r in records:
        if not r.camera_uids:
            continue
        d = os.path.join(str(tmp_path / "model"), "split_result", "visible",
                         r.partition_id, f"partition_{r.partition_id}")
        block_scenes.append(load_colmap_scene(d))
        block_dirs.append(os.path.join(d, "output"))
        block_ids.append(r.partition_id)

    cfg = _cfg()
    cfg.optim.iterations = 60
    cfg.optim.densify_from_iter = 10_000
    cfg.test_iterations = [40]
    progress = {}

    def mark(bid, **kw):
        progress.setdefault(bid, {}).update(kw)

    # phase 1: "crash" after iteration 40 (run only 40 of 60 iterations,
    # checkpoints every 20)
    train_blocks_parallel(
        block_scenes, cfg, mesh=block_mesh(4), log_fn=None,
        iterations=40, block_dirs=block_dirs, block_ids=block_ids,
        progress_fn=mark, checkpoint_interval=20,
    )
    for d, bid in zip(block_dirs, block_ids):
        assert os.path.exists(os.path.join(d, FLEET_CKPT_NAME))
        assert progress[bid]["ckpt_iter"] >= 20
        assert progress[bid]["eval_iter"] == 40  # test_iterations ran
        assert os.path.exists(os.path.join(d, "train_log.jsonl"))  # TB/JSONL

    # phase 2: resume to completion; the loop must START past iter 20
    logs = []
    states = train_blocks_parallel(
        block_scenes, cfg, mesh=block_mesh(4), log_fn=logs.append,
        block_dirs=block_dirs, block_ids=block_ids,
        progress_fn=mark, checkpoint_interval=20, resume=True,
    )
    assert any("resuming from iteration 40" in ln for ln in logs), logs
    assert len(states) == len(block_scenes)
    # rolling checkpoint now records the final iteration
    for d in block_dirs:
        st0 = init_state(block_scenes[0], cfg, (64, 48), jax.random.PRNGKey(0))
        _, it = ckpt.load(os.path.join(d, FLEET_CKPT_NAME), st0)
        assert it == 60


def test_shared_appearance_lockstep(synth, tmp_path):
    """share_appearance=True: every block's appearance state is bitwise
    identical after training (identical init + psum-reduced grads =>
    identical per-view appearance maps across blocks — the fix for the
    reference's per-block exposure divergence); without sharing the
    per-block nets diverge."""
    from pcp_tpu.partition.pipeline import PartitionConfig, run_partition
    from pcp_tpu.scene import load_colmap_scene
    import os

    scene = load_colmap_scene(synth)
    run_partition(
        scene, str(tmp_path / "model"),
        PartitionConfig(threshold=40, expansion_distance=10.0,
                        visible_rate=0.05, remove_outliers=False,
                        make_plots=False),
        export=True, save_test=False,
    )
    base = os.path.join(str(tmp_path / "model"), "split_result", "visible")
    block_scenes = []
    for bid in sorted(os.listdir(base)):
        bdir = os.path.join(base, bid, f"partition_{bid}")
        sc = load_colmap_scene(bdir)
        if sc.cameras:
            block_scenes.append(sc)
    assert len(block_scenes) >= 2

    def run(share):
        cfg = _cfg()
        cfg.pipeline = PipelineConfig(use_appearance=True,
                                      share_appearance=share)
        cfg.optim.iterations = 25
        cfg.optim.densify_from_iter = 10_000
        return train_blocks_parallel(
            block_scenes, cfg, mesh=block_mesh(4), log_fn=None)

    shared = run(True)
    app0 = jax.tree_util.tree_leaves(shared[0].app)
    for st in shared[1:]:
        for a, b in zip(app0, jax.tree_util.tree_leaves(st.app)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(np.isfinite(np.asarray(a)).all() for a in app0)

    indep = run(False)
    diverged = False
    for st in indep[1:]:
        for a, b in zip(jax.tree_util.tree_leaves(indep[0].app),
                        jax.tree_util.tree_leaves(st.app)):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                diverged = True
    assert diverged
