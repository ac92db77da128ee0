"""Mixed camera resolutions (reference handles per-camera sizes,
utils/camera_utils.py:21-50): single-block loop compiles one step per size;
the fleet pads to the max frame and masks losses to each native size."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tests.synthetic import write_synthetic_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mixed"))
    write_synthetic_scene(d, np.random.default_rng(5), n_points=80, n_cams=6)
    return d


def _mixed_scene(scene_dir):
    from pcp_tpu.scene import load_colmap_scene

    scene = load_colmap_scene(scene_dir)
    # declare every other camera at half resolution; the loader resizes the
    # ground truth to the declared size (loadCam semantics)
    for i, c in enumerate(scene.cameras):
        if i % 2 == 1:
            scene.cameras[i] = dataclasses.replace(
                c, width=c.width // 2, height=c.height // 2
            )
    return scene


def _cfg(scene_dir, out, iters=8):
    from pcp_tpu.train.config import (
        ModelConfig,
        OptimConfig,
        PipelineConfig,
        TrainRunConfig,
    )

    return TrainRunConfig(
        model=ModelConfig(source_path=scene_dir, model_path=out,
                          resolution=1, sh_degree=0),
        optim=OptimConfig(iterations=iters, capacity=128, max_per_tile=64,
                          densify_from_iter=1_000),
        pipeline=PipelineConfig(use_appearance=False),
        test_iterations=[], save_iterations=[],
    )


def test_single_block_trains_two_resolutions(scene_dir, tmp_path):
    from pcp_tpu.train.loop import train_scene

    scene = _mixed_scene(scene_dir)
    state = train_scene(scene, _cfg(scene_dir, str(tmp_path / "o")),
                        log_fn=None)
    assert np.all(np.isfinite(np.asarray(state.params["xyz"])))


def test_fleet_trains_two_resolutions(scene_dir, tmp_path):
    from pcp_tpu.parallel.fleet import block_mesh, train_blocks_parallel

    scene = _mixed_scene(scene_dir)
    states = train_blocks_parallel(
        [scene, scene], _cfg(scene_dir, str(tmp_path / "f"), iters=4),
        mesh=block_mesh(2), log_fn=None,
    )
    for st in states:
        assert np.all(np.isfinite(np.asarray(st.params["xyz"])))


def test_masked_losses_match_native(rng):
    """Pad-and-mask L1/SSIM == native-resolution values (zero-pad convs)."""
    from pcp_tpu.utils.loss import l1_loss, ssim

    h, w, hp, wp = 24, 32, 40, 48
    a = jnp.asarray(rng.uniform(size=(h, w, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(size=(h, w, 3)), jnp.float32)
    ap = jnp.zeros((hp, wp, 3)).at[:h, :w].set(a)
    bp = jnp.zeros((hp, wp, 3)).at[:h, :w].set(b)
    mask = (jnp.arange(wp)[None, :] < w) & (jnp.arange(hp)[:, None] < h)

    np.testing.assert_allclose(
        float(l1_loss(ap, bp, mask)), float(l1_loss(a, b)), rtol=1e-6
    )
    chw = lambda x: jnp.transpose(x, (2, 0, 1))
    np.testing.assert_allclose(
        float(ssim(chw(ap), chw(bp), valid_mask=mask)),
        float(ssim(chw(a), chw(b))),
        rtol=1e-5,
    )
