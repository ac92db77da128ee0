"""End-to-end: synthetic COLMAP scene -> short training run -> PSNR climbs.

The reference has no tests; this encodes its implicit contract that
training_report PSNR improves over iterations (train.py:188-243).
"""

import numpy as np
import pytest

from tests.synthetic import write_synthetic_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    write_synthetic_scene(str(d), np.random.default_rng(3), n_points=80, n_cams=8)
    return str(d)


def test_scene_loads(scene_dir):
    from pcp_tpu.scene import load_colmap_scene

    scene = load_colmap_scene(scene_dir)
    assert len(scene.cameras) == 8
    assert scene.points.shape == (80, 3)
    assert scene.extent > 0


def test_training_improves_psnr(scene_dir, tmp_path):
    import jax.numpy as jnp

    from pcp_tpu.scene import cameras as cam_mod
    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train.config import (
        ModelConfig,
        OptimConfig,
        PipelineConfig,
        TrainRunConfig,
    )
    from pcp_tpu.train.loop import evaluate_cameras, init_state, train_scene

    scene = load_colmap_scene(scene_dir)
    cfg = TrainRunConfig(
        model=ModelConfig(source_path=scene_dir, model_path=str(tmp_path / "out"),
                          resolution=1, sh_degree=3),
        optim=OptimConfig(
            iterations=400,
            capacity=256,
            max_per_tile=128,
            densify_from_iter=100,
            densification_interval=100,
            opacity_reset_interval=10_000,
            densify_until_iter=300,
        ),
        pipeline=PipelineConfig(use_appearance=False),
        test_iterations=[],
        save_iterations=[400],
    )
    cams = [cam_mod.from_info(i, 1) for i in scene.cameras]
    bg = jnp.zeros(3)

    import jax

    state0 = init_state(scene, cfg, (cams[0].width, cams[0].height),
                        jax.random.PRNGKey(0))
    before = evaluate_cameras(state0, cams[:2], 0, bg, cfg.optim)

    state = train_scene(scene, cfg, log_fn=None)
    after = evaluate_cameras(state, cams[:2], 0, bg, cfg.optim)

    assert after["psnr"] > before["psnr"] + 2.0, (before, after)
    assert after["psnr"] > 19.0, (before, after)

    # PLY snapshot written in the reference layout
    import os

    assert os.path.exists(
        tmp_path / "out" / "point_cloud" / "iteration_400" / "point_cloud.ply"
    )


def test_checkpoint_roundtrip(scene_dir, tmp_path):
    import jax

    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train import checkpoint as ckpt
    from pcp_tpu.train.config import (
        ModelConfig,
        OptimConfig,
        PipelineConfig,
        TrainRunConfig,
    )
    from pcp_tpu.train.loop import init_state

    scene = load_colmap_scene(scene_dir)
    cfg = TrainRunConfig(
        model=ModelConfig(), optim=OptimConfig(iterations=10, capacity=128),
        pipeline=PipelineConfig(use_appearance=False),
    )
    state = init_state(scene, cfg, (64, 48), jax.random.PRNGKey(0))
    p = str(tmp_path / "c.npz")
    ckpt.save(p, state, 7)
    state2, it = ckpt.load(p, state)
    assert it == 7
    np.testing.assert_array_equal(
        np.asarray(state.params["xyz"]), np.asarray(state2.params["xyz"])
    )


def test_debug_mode_dumps_on_nan(scene_dir, tmp_path):
    """--debug forensics (reference snapshot dumps + --detect_anomaly):
    a NaN injected into the Gaussian params must produce an npz dump of the
    step inputs and a FloatingPointError naming it."""
    import glob

    import jax
    import numpy as np
    import pytest

    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train.config import (
        ModelConfig,
        OptimConfig,
        PipelineConfig,
        TrainRunConfig,
    )
    from pcp_tpu.train.loop import init_state, train_scene

    scene = load_colmap_scene(scene_dir)
    out = str(tmp_path / "dbg")
    cfg = TrainRunConfig(
        model=ModelConfig(source_path=scene_dir, model_path=out,
                          resolution=1, sh_degree=0),
        optim=OptimConfig(iterations=3, capacity=256, max_per_tile=64,
                          densify_from_iter=1_000),
        pipeline=PipelineConfig(use_appearance=False),
        test_iterations=[], save_iterations=[],
    )
    state = init_state(scene, cfg, (64, 48), jax.random.PRNGKey(0))
    # NaN every color: any visible Gaussian poisons the rendered image
    # (a NaN position would just be frustum-culled)
    bad = state.params["f_dc"] * np.nan
    state = state._replace(params={**state.params, "f_dc": bad})

    with pytest.raises(FloatingPointError, match="non-finite loss"):
        train_scene(scene, cfg, log_fn=None, state=state, debug=True)
    dumps = glob.glob(out + "/nan_snapshot_*.npz")
    assert len(dumps) == 1
    data = np.load(dumps[0])
    assert "gt_image" in data and "viewmat" in data
    assert any(k.startswith("state_leaf_") for k in data.files)


def test_checkpoint_orbax_roundtrip(scene_dir, tmp_path):
    """Orbax backend (path without .npz) restores the full TrainState
    exactly, like the npz backend."""
    import jax
    import numpy as np

    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train import checkpoint as ckpt
    from pcp_tpu.train.config import (
        ModelConfig, OptimConfig, PipelineConfig, TrainRunConfig,
    )
    from pcp_tpu.train.loop import init_state

    scene = load_colmap_scene(scene_dir)
    cfg = TrainRunConfig(
        model=ModelConfig(source_path=scene_dir, model_path=str(tmp_path),
                          resolution=1, sh_degree=1),
        optim=OptimConfig(iterations=1, capacity=128),
        pipeline=PipelineConfig(use_appearance=True),
    )
    state = init_state(scene, cfg, (64, 48), jax.random.PRNGKey(7))
    path = str(tmp_path / "ckpt_orbax")
    ckpt.save(path, state, 1234)

    template = init_state(scene, cfg, (64, 48), jax.random.PRNGKey(8))
    restored, it = ckpt.load(path, template)
    assert it == 1234
    for got, want in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(state)
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_auto_tiles_retune_sets_active_cap(scene_dir, tmp_path, monkeypatch):
    """--max_per_tile 0 auto mode: the re-tuner sizes the tile levels AND
    the alive-scaled binning bound (active_cap), recompiles mid-run, and
    training stays finite through the geometry change."""
    import jax
    import jax.numpy as jnp

    from pcp_tpu.scene import cameras as cam_mod
    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train.config import (
        ModelConfig,
        OptimConfig,
        PipelineConfig,
        TrainRunConfig,
    )
    from pcp_tpu.train.loop import evaluate_cameras, train_scene

    monkeypatch.setenv("PCP_RETUNE", "100")
    scene = load_colmap_scene(scene_dir)
    cfg = TrainRunConfig(
        model=ModelConfig(source_path=scene_dir,
                          model_path=str(tmp_path / "out"),
                          resolution=1, sh_degree=3),
        optim=OptimConfig(
            iterations=200,
            capacity=1024,          # >> 80 alive: the scaled bound engages
            max_per_tile=0,         # auto tiles + re-tune
            densify_from_iter=10_000,
            opacity_reset_interval=10_000,
        ),
        pipeline=PipelineConfig(use_appearance=False),
        test_iterations=[],
        save_iterations=[],
    )
    logs = []
    state = train_scene(scene, cfg, log_fn=logs.append)
    joined = "\n".join(logs)
    assert "auto tile levels (init)" in joined
    # capacity 1024 vs ~80 alive -> ceil(1.5*80/65536)*65536 = 65536 > 1024
    # would disable; instead the snap floor keeps it full -> assert the
    # log reports the decision either way and training stayed finite
    cams = [cam_mod.from_info(i, 1) for i in scene.cameras]
    after = evaluate_cameras(state, cams[:2], 0, jnp.zeros(3), cfg.optim)
    assert jnp.isfinite(jnp.asarray(after["psnr"]))
    assert "active_cap" in joined
