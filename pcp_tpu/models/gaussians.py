"""Capacity-padded 3D Gaussian scene model as a JAX pytree.

TPU-first redesign of the reference's `GaussianModel`
(scene/gaussian_model.py:26-435). The reference grows/shrinks torch tensors
every densification step; XLA requires static shapes, so here every per-
Gaussian array has a fixed ``capacity`` of slots plus an ``alive`` mask, and
densify / prune / opacity-reset are pure masked array transforms that never
change shapes (and therefore never trigger recompilation).

Parameters (all stored *pre-activation*, exactly the reference's schema so
PLY files interoperate, gaussian_model.py:189-220):

  xyz       (C, 3)      world positions
  f_dc      (C, 3)      SH DC color coefficients
  f_rest    (C, 15, 3)  SH rest coefficients (degree 3)
  scaling   (C, 3)      log-scales            (activation: exp)
  rotation  (C, 4)      quaternions [w,x,y,z] (activation: normalize)
  opacity   (C, 1)      logits                (activation: sigmoid)

Non-optimized state lives in ``DensifyStats`` (alive mask, screen-space
gradient accumulators, max 2D radii), mirroring gaussian_model.py:60-66,
433-435.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcp_tpu.io import ply as ply_io
from pcp_tpu.ops.knn import mean_sq_dist_3nn
from pcp_tpu.utils.general import inverse_sigmoid, normalize
from pcp_tpu.utils.sh import num_sh_bases, rgb_to_sh

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GaussianConfig:
    """Static model configuration.

    ``capacity`` bounds the Gaussian population (reference cap: 6,000,000,
    train.py:146); ``percent_dense`` is the clone-vs-split scale boundary
    (arguments/__init__.py:103, gaussian_model.py:377-415).
    """

    sh_degree: int = 3
    capacity: int = 1 << 20
    percent_dense: float = 0.01

    @property
    def n_sh_rest(self) -> int:
        return num_sh_bases(self.sh_degree) - 1


# ---------------------------------------------------------------------------
# Activations (gaussian_model.py:28-44, 102-132)
# ---------------------------------------------------------------------------


def scaling_act(scaling):
    return jnp.exp(scaling)


def opacity_act(opacity):
    return jax.nn.sigmoid(opacity)


def rotation_act(rotation):
    return normalize(rotation, axis=-1)


def sh_coeffs(params: Params) -> jnp.ndarray:
    """(C, K, 3) full SH coefficient tensor (dc ++ rest), like
    get_features (gaussian_model.py:119-123)."""
    return jnp.concatenate([params["f_dc"][:, None, :], params["f_rest"]], axis=1)


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------


def create_from_pcd(
    xyz: np.ndarray,
    rgb: np.ndarray,
    cfg: GaussianConfig,
) -> Tuple[Params, jnp.ndarray]:
    """Initialise Gaussians from a colored point cloud.

    Mirrors create_from_pcd (gaussian_model.py:134-157): DC SH from RGB,
    log-scale = log sqrt(mean sq dist to 3-NN) isotropic, identity rotation,
    opacity logit(0.1). Points beyond ``cfg.capacity`` are dropped; free
    slots are zero-padded and masked dead.

    Returns (params, alive_mask).
    """
    n = min(len(xyz), cfg.capacity)
    c = cfg.capacity
    xyz = np.asarray(xyz, np.float32)[:n]
    rgb = np.asarray(rgb, np.float32)[:n]
    if rgb.max() > 1.5:  # 0..255 input
        rgb = rgb / 255.0

    dist2 = mean_sq_dist_3nn(jnp.asarray(xyz))
    log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(a, shape_tail):
        out = jnp.zeros((c,) + shape_tail, jnp.float32)
        return out.at[:n].set(jnp.asarray(a, jnp.float32))

    rot = np.zeros((n, 4), np.float32)
    rot[:, 0] = 1.0
    params: Params = {
        "xyz": pad(xyz, (3,)),
        "f_dc": pad(rgb_to_sh(jnp.asarray(rgb)), (3,)),
        "f_rest": jnp.zeros((c, cfg.n_sh_rest, 3), jnp.float32),
        "scaling": pad(log_scale, (3,)),
        "rotation": jnp.zeros((c, 4), jnp.float32).at[:, 0].set(1.0),
        "opacity": pad(
            np.full((n, 1), float(inverse_sigmoid(0.1)), np.float32), (1,)
        ),
    }
    # Dead slots get a harmless identity rotation and tiny scale so
    # activations stay finite; opacity logit is very negative -> alpha ~ 0.
    dead = jnp.arange(c) >= n
    params["scaling"] = jnp.where(dead[:, None], -10.0, params["scaling"])
    params["opacity"] = jnp.where(dead[:, None], -10.0, params["opacity"])
    alive = jnp.arange(c) < n
    return params, alive


def init_densify_stats(capacity: int) -> Dict[str, jnp.ndarray]:
    """Screen-space gradient accumulators (gaussian_model.py:181-184)."""
    return {
        "grad_accum": jnp.zeros((capacity,), jnp.float32),
        "denom": jnp.zeros((capacity,), jnp.float32),
        "max_radii2d": jnp.zeros((capacity,), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Densification / pruning (gaussian_model.py:280-435) — static shapes
# ---------------------------------------------------------------------------


def _compact_scatter(params: Params, alive, children: Params, child_valid):
    """Scatter valid children into dead slots (fixed capacity).

    ``children`` arrays have a leading axis of candidate children; the k-th
    valid child fills the k-th dead slot. Children that don't fit (population
    cap) are dropped, mirroring the reference's 6M cap (train.py:146).

    Returns (params, alive, written_mask) where written_mask (C,) flags slots
    that just received a new Gaussian (optimizer moments must be zeroed
    there — the reference's cat_tensors_to_optimizer zero-moment surgery,
    gaussian_model.py:306-330).
    """
    c = alive.shape[0]
    # k-th dead slot index: stable argsort of alive (False < True).
    dead_slots = jnp.argsort(alive, stable=True)  # dead slots first
    n_free = c - jnp.sum(alive)
    rank = jnp.cumsum(child_valid) - 1  # rank among valid children
    ok = child_valid & (rank < n_free)
    target = jnp.where(ok, dead_slots[jnp.clip(rank, 0, c - 1)], c)  # c = drop

    new_params = {}
    for k, v in params.items():
        new_params[k] = v.at[target].set(children[k], mode="drop")
    written = jnp.zeros((c,), bool).at[target].set(ok, mode="drop")
    alive = alive | written
    return new_params, alive, written


def densify_and_prune(
    params: Params,
    alive: jnp.ndarray,
    stats: Dict[str, jnp.ndarray],
    rng_key: jax.Array,
    *,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    percent_dense: float = 0.01,
    prune_big_screen: bool = False,
    max_screen_size: float = 20.0,
) -> Tuple[Params, jnp.ndarray, jnp.ndarray]:
    """One densify+prune step (densify_and_prune, gaussian_model.py:417-429).

    clone: avg grad >= threshold and max scale <= percent_dense*extent —
      duplicate in place (densify_and_clone, :397-415).
    split: avg grad >= threshold and max scale > percent_dense*extent —
      two children at sigma-sampled offsets with scale / (0.8*2), original
      pruned (densify_and_split, :377-395).
    prune: opacity < min_opacity; optionally screen radius > 20 px or world
      size > 0.1 * extent (:417-429).

    Pure function of fixed-shape arrays. Returns (params, alive, written)
    where ``written`` marks slots whose optimizer moments must be zeroed.
    """
    c = alive.shape[0]
    grads = stats["grad_accum"] / jnp.maximum(stats["denom"], 1.0)
    max_scale = jnp.max(scaling_act(params["scaling"]), axis=-1)

    hot = alive & (grads >= grad_threshold)
    clone = hot & (max_scale <= percent_dense * extent)
    split = hot & (max_scale > percent_dense * extent)

    # ---- prune first (frees slots for children) ----
    prune = alive & (opacity_act(params["opacity"])[:, 0] < min_opacity)
    if prune_big_screen:
        prune = prune | (alive & (stats["max_radii2d"] > max_screen_size))
        prune = prune | (alive & (max_scale > 0.1 * extent))
    prune = prune | split  # split replaces the original with 2 children
    alive = alive & ~prune

    # ---- children: axis 0 = {clone-or-split-child-0, split-child-1} ----
    key0, key1 = jax.random.split(rng_key)
    stds = scaling_act(params["scaling"])  # (C, 3)
    rot = _quat_rotmats(params["rotation"])  # (C, 3, 3)

    def split_child(key):
        noise = jax.random.normal(key, (c, 3)) * stds
        new_xyz = params["xyz"] + jnp.einsum("nij,nj->ni", rot, noise)
        child = dict(params)
        child["xyz"] = new_xyz
        child["scaling"] = jnp.log(stds / (0.8 * 2.0))
        return child

    child0_split = split_child(key0)
    child1_split = split_child(key1)
    # clone child = verbatim copy; select per-slot between clone/split child0.
    child0 = jax.tree_util.tree_map(
        lambda s, p: jnp.where(_bmask(split, s), s, p), child0_split, params
    )
    children = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), child0, child1_split
    )
    child_valid = jnp.concatenate([clone | split, split], axis=0)

    params, alive, written = _compact_scatter(params, alive, children, child_valid)

    # Keep dead slots numerically inert.
    dead = ~alive
    params["opacity"] = jnp.where(dead[:, None], -10.0, params["opacity"])
    params["scaling"] = jnp.where(dead[:, None], -10.0, params["scaling"])
    written = written | prune  # moments at pruned slots are stale too
    return params, alive, written


def _bmask(mask, arr):
    """Broadcast a (C,) mask against arr's trailing dims (first axis C)."""
    return mask.reshape(mask.shape + (1,) * (arr.ndim - 1))


def _quat_rotmats(q):
    from pcp_tpu.utils.general import quat_to_rotmat

    return quat_to_rotmat(q)


def reset_opacity(params: Params, alive: jnp.ndarray) -> Params:
    """Clamp all opacities to at most 0.01 (reset_opacity,
    gaussian_model.py:231-234). Returns updated params; the caller must also
    zero the opacity optimizer moments (replace_tensor_to_optimizer)."""
    cap = math.log(0.01 / 0.99)  # inverse_sigmoid(0.01), host-side
    new_op = jnp.minimum(params["opacity"], cap)
    out = dict(params)
    out["opacity"] = jnp.where(_bmask(alive, new_op), new_op, params["opacity"])
    return out


# ---------------------------------------------------------------------------
# PLY interop (gaussian_model.py:189-278 schema)
# ---------------------------------------------------------------------------


def save_gaussians_ply(path: str, params: Params, alive) -> None:
    """Write live Gaussians in the reference PLY schema."""
    m = np.asarray(alive)
    ply_io.save_gaussian_ply(
        path,
        np.asarray(params["xyz"])[m],
        np.asarray(params["f_dc"])[m],
        np.asarray(params["f_rest"])[m],
        np.asarray(params["opacity"])[m],
        np.asarray(params["scaling"])[m],
        np.asarray(params["rotation"])[m],
    )


def load_gaussians_ply(path: str, cfg: GaussianConfig) -> Tuple[Params, jnp.ndarray]:
    """Read a reference-schema Gaussian PLY into a capacity-padded pytree."""
    d = ply_io.load_gaussian_ply(path)
    n = min(len(d["xyz"]), cfg.capacity)
    c = cfg.capacity

    def pad(a):
        a = np.asarray(a, np.float32)[:n]
        out = np.zeros((c,) + a.shape[1:], np.float32)
        out[:n] = a
        return jnp.asarray(out)

    params: Params = {
        "xyz": pad(d["xyz"]),
        "f_dc": pad(d["f_dc"].reshape(-1, 3)),
        "f_rest": pad(d["f_rest"]),
        "scaling": pad(d["scaling"]),
        "rotation": pad(d["rotation"]),
        "opacity": pad(d["opacity"].reshape(-1, 1)),
    }
    alive = jnp.arange(c) < n
    params["scaling"] = jnp.where(~alive[:, None], -10.0, params["scaling"])
    params["opacity"] = jnp.where(~alive[:, None], -10.0, params["opacity"])
    return params, alive
