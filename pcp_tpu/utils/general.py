"""Schedules, quaternion/scaling helpers, RNG seeding.

Parity with the reference's utils/general_utils.py (exp LR schedule :29-62,
quaternion->rotation :78-97, build_scaling_rotation :100-110, safe_state
seeding :112-133) in jnp.
"""

from __future__ import annotations

import random

import jax.numpy as jnp
import numpy as np


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1_000_000):
    """Plenoxels-style log-linear LR schedule with optional delayed warmup.

    Continuous-function parity with general_utils.get_expon_lr_func(:29-62):
    returns 0 when lr_init == 0 (disabled group); clamps step to [0, max_steps].
    Works on traced or concrete `step`.
    """
    step = jnp.asarray(step, dtype=jnp.float32)
    lr_init = jnp.asarray(lr_init, dtype=jnp.float32)
    lr_final = jnp.asarray(lr_final, dtype=jnp.float32)
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        jnp.log(jnp.maximum(lr_init, 1e-32)) * (1 - t)
        + jnp.log(jnp.maximum(lr_final, 1e-32)) * t
    )
    log_lerp = jnp.where(lr_init == 0.0, 0.0, log_lerp)  # disabled group
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp


def inverse_sigmoid(x):
    """logit; gaussian_model stores opacity pre-sigmoid (general_utils.py:18)."""
    x = jnp.asarray(x)
    return jnp.log(x / (1.0 - x))


def normalize(v, axis=-1, eps=1e-12):
    return v / (jnp.linalg.norm(v, axis=axis, keepdims=True) + eps)


def quat_to_rotmat(q):
    """Unit quaternion(s) [w, x, y, z] -> rotation matrix(ces), jnp.

    Batched: q (..., 4) -> (..., 3, 3). Normalizes first, matching
    build_rotation (general_utils.py:78-97).
    """
    q = normalize(jnp.asarray(q), axis=-1)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_scaling_rotation(scales, quats):
    """L = R @ diag(s): the factor whose L L^T is the 3D covariance
    (general_utils.py:100-110, gaussian_model.py:28-37)."""
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def covariance_from_scaling_rotation(scales, quats):
    """Full 3x3 covariance Sigma = L L^T (symmetric PSD)."""
    L = build_scaling_rotation(scales, quats)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov):
    """3x3 symmetric -> 6-vector upper triangle [xx, xy, xz, yy, yz, zz]
    (gaussian_model.py:38-44 packing order)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def safe_state(seed: int = 0):
    """Seed python/numpy RNGs for reproducibility (general_utils.py:130-133).
    JAX randomness is explicit-key; callers thread jax.random keys."""
    random.seed(seed)
    np.random.seed(seed)
