"""models/: appearance net building blocks vs torch oracles; densify/prune
invariants on the capacity-padded Gaussian pytree."""

import jax
import jax.numpy as jnp
import numpy as np

from pcp_tpu.models import appearance as app_mod
from pcp_tpu.models import gaussians as G


def test_pixel_shuffle_matches_torch(rng):
    import torch

    x = rng.normal(size=(2, 5, 7, 16)).astype(np.float32)
    got = np.asarray(app_mod._pixel_shuffle(jnp.asarray(x), 2))
    want = (
        torch.nn.PixelShuffle(2)(torch.from_numpy(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bilinear_resize_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.normal(size=(1, 6, 8, 3)).astype(np.float32)
    got = np.asarray(app_mod._bilinear_resize(jnp.asarray(x), 48, 64))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(48, 64),
            mode="bilinear", align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_appearance_decouple_shapes(rng):
    params = app_mod.init_appearance(jax.random.PRNGKey(0), (64, 48))
    img = jnp.asarray(rng.uniform(size=(48, 64, 3)).astype(np.float32))
    out, mapping = app_mod.decouple_appearance(img, params, jnp.int32(5))
    assert out.shape == (48, 64, 3)
    assert mapping.shape == (48, 64, 3)
    assert float(mapping.min()) >= 0.0 and float(mapping.max()) <= 1.0


def _tiny_model(rng, n=20, cap=64):
    cfg = G.GaussianConfig(sh_degree=1, capacity=cap)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.uniform(size=(n, 3)).astype(np.float32)
    params, alive = G.create_from_pcd(xyz, rgb, cfg)
    return cfg, params, alive


def test_create_from_pcd_basics(rng):
    cfg, params, alive = _tiny_model(rng)
    assert int(alive.sum()) == 20
    assert params["xyz"].shape == (64, 3)
    assert params["f_rest"].shape == (64, 3, 3)
    # dead slots are inert: activated opacity ~ 0
    op = np.asarray(G.opacity_act(params["opacity"]))[:, 0]
    assert np.all(op[20:] < 1e-4)


def test_densify_clone_fills_free_slots(rng):
    cfg, params, alive = _tiny_model(rng)
    stats = G.init_densify_stats(64)
    # force every live Gaussian over the grad threshold, all small -> clone
    stats = dict(stats)
    stats["grad_accum"] = jnp.where(alive, 1.0, 0.0)
    stats["denom"] = jnp.ones(64)
    params = dict(params)
    params["scaling"] = jnp.full((64, 3), -5.0)  # tiny -> clone path
    new_params, new_alive, written = G.densify_and_prune(
        params, alive, stats, jax.random.PRNGKey(0),
        grad_threshold=0.5, min_opacity=0.005, extent=10.0,
    )
    assert int(new_alive.sum()) == 40  # each cloned once
    assert int(written.sum()) >= 20
    # clones are verbatim copies: multiset of xyz doubles
    live_xyz = np.asarray(new_params["xyz"])[np.asarray(new_alive)]
    uniq, counts = np.unique(np.round(live_xyz, 5), axis=0, return_counts=True)
    assert np.all(counts == 2)


def test_densify_split_replaces_original(rng):
    cfg, params, alive = _tiny_model(rng)
    stats = G.init_densify_stats(64)
    stats = dict(stats)
    stats["grad_accum"] = jnp.where(alive, 1.0, 0.0)
    stats["denom"] = jnp.ones(64)
    params = dict(params)
    params["scaling"] = jnp.where(alive[:, None], 2.0, -10.0)  # huge -> split
    new_params, new_alive, written = G.densify_and_prune(
        params, alive, stats, jax.random.PRNGKey(0),
        grad_threshold=0.5, min_opacity=0.005, extent=1.0,
    )
    # 20 originals die, 40 children born -> 40 alive
    assert int(new_alive.sum()) == 40
    # children scales shrink by 1/1.6
    live_scale = np.asarray(G.scaling_act(new_params["scaling"]))[np.asarray(new_alive)]
    np.testing.assert_allclose(live_scale, np.exp(2.0) / 1.6, rtol=1e-5)


def test_prune_low_opacity(rng):
    cfg, params, alive = _tiny_model(rng)
    params = dict(params)
    # kill half the live slots via low opacity
    op = np.asarray(params["opacity"]).copy()
    op[:10] = -10.0
    params["opacity"] = jnp.asarray(op)
    stats = G.init_densify_stats(64)
    new_params, new_alive, written = G.densify_and_prune(
        params, alive, stats, jax.random.PRNGKey(0),
        grad_threshold=1e9, min_opacity=0.005, extent=10.0,
    )
    assert int(new_alive.sum()) == 10


def test_capacity_cap_drops_overflow(rng):
    cfg, params, alive = _tiny_model(rng, n=60, cap=64)
    stats = G.init_densify_stats(64)
    stats = dict(stats)
    stats["grad_accum"] = jnp.where(alive, 1.0, 0.0)
    stats["denom"] = jnp.ones(64)
    params = dict(params)
    params["scaling"] = jnp.full((64, 3), -5.0)
    new_params, new_alive, _ = G.densify_and_prune(
        params, alive, stats, jax.random.PRNGKey(0),
        grad_threshold=0.5, min_opacity=0.005, extent=10.0,
    )
    assert int(new_alive.sum()) == 64  # capped, no overflow

def test_opacity_reset(rng):
    cfg, params, alive = _tiny_model(rng)
    out = G.reset_opacity(params, alive)
    op = np.asarray(G.opacity_act(out["opacity"]))[np.asarray(alive), 0]
    assert np.all(op <= 0.0100001)
