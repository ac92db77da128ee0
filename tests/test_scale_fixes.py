"""Regression tests for the round-3 scale fixes (k-cap saturation storm).

The first full-schedule scale run exposed three defects, all fixed in the
final round-3 commits but untested until now:

1. `_cap_fit` (ops/binning.py): the tile-level sizers clamped k_top at a
   hard cap (4096) BELOW the densest tile's measured load (7713) — a
   standing zero-drop violation no re-tune could fix.
2. The forced-retune churn guard (train/loop.retune_decision): a reactive
   re-tune whose re-measured geometry is equivalent (same k_top, slot cost
   within 2%) recompiled an identical program every 100 iters (~40 s each
   through the tunnel, ~25% of wall).
3. The STOP-file graceful save (train/loop.py): a wall-clock-bounded run
   must leave a PLY + resumable checkpoint at the CURRENT iteration
   instead of losing everything since the last save boundary.
"""

import os

import numpy as np
import pytest

from tests.synthetic import write_synthetic_scene


# ---------------------------------------------------------------- _cap_fit


def test_cap_fit_bounds_headroom_never_load():
    """cap limits HEADROOM above the measured load, never the load: the
    effective ceiling always covers the densest observed tile."""
    from pcp_tpu.ops.binning import _cap_fit

    # the literal round-3 regression: max load 7713 vs hard cap 4096 must
    # yield a k ceiling >= the load (chunk-rounded: 7808, the geometry the
    # restarted run actually used)
    assert _cap_fit(7713, 4096, 128) == 7808
    # below the cap the cap itself is the ceiling
    assert _cap_fit(100, 4096, 128) == 4096
    assert _cap_fit(0, 4096, 128) == 4096


def test_choose_tile_levels_covers_saturating_load():
    """A load distribution whose max exceeds the cap still gets a k_top
    >= the max load — no standing saturation."""
    from pcp_tpu.ops.binning import choose_tile_levels

    num_tiles = 4000
    rng = np.random.default_rng(0)
    loads = rng.integers(100, 900, (2, num_tiles))
    loads[0, 17] = 7713            # one storm tile far beyond the cap
    k0, levels = choose_tile_levels(loads, num_tiles, chunk=128, cap=4096)
    k_top = levels[-1][0] if levels else k0
    assert k_top >= 7713
    # and the top level has room for the storm tile
    if levels:
        assert levels[-1][1] >= 1


def test_autosize_max_per_tile_covers_saturating_load():
    """Single-table sizing: one rect pile-up past the cap still yields
    K >= the measured load (binning then drops nothing)."""
    from pcp_tpu.ops.binning import autosize_max_per_tile

    # 600 gaussians all covering tile (0, 0) of a 4x4 grid, cap 256
    rect = np.zeros((600, 4), np.int32)
    rect[:, 2:] = 1                               # [0,0,1,1] -> tile 0 only
    k = autosize_max_per_tile([(rect, 4, 4)], chunk=128, cap=256)
    assert k >= 600


def test_levels_binning_zero_drops_past_cap():
    """End-to-end: bin a tile whose load exceeds the old cap with
    _cap_fit-sized levels -> zero drops, full load present."""
    import jax.numpy as jnp

    from pcp_tpu.ops.binning import bin_gaussians_levels, choose_tile_levels

    n, tiles_x, tiles_y = 600, 4, 4
    rng = np.random.default_rng(1)
    rect = np.zeros((n, 4), np.int32)
    rect[:, 2:] = 1                               # everyone in tile 0
    loads = np.zeros((1, tiles_x * tiles_y), np.int64)
    loads[0, 0] = n
    k0, levels = choose_tile_levels(loads, tiles_x * tiles_y,
                                    chunk=128, cap=256)
    k_top = levels[-1][0] if levels else k0
    assert k_top >= n
    b = bin_gaussians_levels(
        jnp.asarray(rect), jnp.asarray(rng.uniform(1, 2, n).astype(np.float32)),
        tiles_x, tiles_y, k0=k0, levels=levels)
    assert int(b.n_dropped) == 0
    assert int(b.max_tile_load) == n
    assert int(b.tile_count[0]) == n


# ------------------------------------------------------------- churn guard


def _mk_ocfg(**kw):
    from pcp_tpu.train.config import OptimConfig

    base = dict(capacity=1 << 16, max_per_tile=1024, tile_k_lo=256,
                tile_levels="512:64,1024:16", active_cap=32768,
                pair_levels="4:1000,16:100")
    base.update(kw)
    return OptimConfig(**base)


def test_retune_decision_forced_equivalent_no_recompile():
    """Forced re-tune, same k_top, slot cost within 2% -> NO recompile
    (the round-3 storm recompiled an equivalent program every 100 iters)."""
    from pcp_tpu.train.loop import retune_decision

    a = _mk_ocfg()
    b = _mk_ocfg(tile_levels="512:64,1024:24")    # tiny capacity jiggle
    assert retune_decision(a, b, 100_000, 100_500, forced=True) is False


def test_retune_decision_forced_material_change_recompiles():
    from pcp_tpu.train.loop import retune_decision

    a = _mk_ocfg()
    # forced + k_top grew (saturation fix): must recompile even at ~0 cost move
    b = _mk_ocfg(max_per_tile=2048, tile_levels="512:64,2048:16")
    assert retune_decision(a, b, 100_000, 101_000, forced=True) is True
    # forced + >2% cost move: recompile
    c = _mk_ocfg(tile_levels="512:64,1024:128")
    assert retune_decision(a, c, 100_000, 104_000, forced=True) is True


def test_retune_decision_scheduled_hysteresis():
    from pcp_tpu.train.loop import retune_decision

    a = _mk_ocfg()
    b = _mk_ocfg(tile_levels="512:64,1024:24")
    # scheduled re-tune: 5% cost move, same k_top -> ride it out
    assert retune_decision(a, b, 100_000, 105_000, forced=False) is False
    # >20% move -> recompile
    assert retune_decision(a, b, 100_000, 130_000, forced=False) is True
    # identical geometry is never recompiled, forced or not
    assert retune_decision(a, a, 100_000, 100_000, forced=True) is False


def test_table_slot_cost_counts_levels_and_expansion():
    from pcp_tpu.train.loop import table_slot_cost

    oc = _mk_ocfg()
    cost = table_slot_cost(oc, num_tiles=100, capacity=1 << 16)
    # dense base + levels
    table = 100 * 256 + 512 * 64 + 1024 * 16
    assert cost > table                      # expansion slots folded in
    # active_cap change alone moves the cost (recompile-worthy signal)
    oc2 = _mk_ocfg(active_cap=0)
    assert table_slot_cost(oc2, 100, 1 << 16) != cost


# ---------------------------------------------------------- STOP-file save


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene_stop")
    write_synthetic_scene(str(d), np.random.default_rng(5), n_points=60,
                          n_cams=6)
    return str(d)


def test_stop_file_saves_and_resumes(scene_dir, tmp_path):
    """touch STOP mid-train -> PLY + checkpoint at the current iteration,
    clean exit; resume from that checkpoint reaches the full schedule."""
    import jax

    from pcp_tpu.scene import load_colmap_scene
    from pcp_tpu.train import checkpoint as ckpt
    from pcp_tpu.train.config import (
        ModelConfig,
        OptimConfig,
        PipelineConfig,
        TrainRunConfig,
    )
    from pcp_tpu.train.loop import init_state, train_scene

    scene = load_colmap_scene(scene_dir)
    out = str(tmp_path / "out")

    def mk_cfg():
        return TrainRunConfig(
            model=ModelConfig(source_path=scene_dir, model_path=out,
                              resolution=1, sh_degree=1),
            optim=OptimConfig(iterations=120, capacity=128, max_per_tile=128,
                              densify_from_iter=10_000,
                              opacity_reset_interval=10_000),
            pipeline=PipelineConfig(use_appearance=False),
            test_iterations=[],
            save_iterations=[120],
        )

    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "STOP"), "w"):
        pass

    logs = []
    state = train_scene(scene, mk_cfg(), log_fn=logs.append)
    # STOP is polled every 50 iters: the run must exit at 50, not 120
    assert any("STOP file seen at iter 50" in ln for ln in logs)
    ply = os.path.join(out, "point_cloud", "iteration_50", "point_cloud.ply")
    ck = os.path.join(out, "chkpnt50.npz")
    assert os.path.exists(ply)
    assert os.path.exists(ck)
    assert not os.path.exists(
        os.path.join(out, "point_cloud", "iteration_120"))

    # resume: remove STOP, load the checkpoint, finish the schedule
    os.remove(os.path.join(out, "STOP"))
    cfg = mk_cfg()
    template = init_state(scene, cfg, (scene.cameras[0].width,
                                       scene.cameras[0].height),
                          jax.random.PRNGKey(0))
    state2, it = ckpt.load(ck, template)
    assert it == 50
    train_scene(scene, cfg, state=state2, start_iter=it, log_fn=None)
    assert os.path.exists(
        os.path.join(out, "point_cloud", "iteration_120", "point_cloud.ply"))
