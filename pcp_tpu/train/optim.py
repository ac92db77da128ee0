"""Functional Adam with per-leaf learning rates and moment surgery.

The reference drives torch Adam with six parameter groups at distinct LRs,
an exponentially decayed xyz LR (gaussian_model.py:159-187), and mutates the
optimizer state during densification: moments at newly created Gaussians are
zeroed, and `reset_opacity` replaces the opacity tensor's moments
(gaussian_model.py:280-355 `cat_tensors_to_optimizer` /
`replace_tensor_to_optimizer` / `_prune_optimizer`).

optax's packaged Adam hides its moments behind transform state, which makes
that surgery awkward, so this is a ~60-line explicit Adam over pytrees:
state = {mu, nu, count}; per-leaf LR = callable(step) or float, keyed by the
param tree structure. eps matches the reference's 1e-15 (gaussian_model.py
training_setup).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Union

import jax
import jax.numpy as jnp

LrSpec = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]

B1, B2 = 0.9, 0.999
EPS = 1e-15


def init_adam(params) -> Dict[str, Any]:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return {
        "mu": zeros,
        "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
        "count": jnp.zeros((), jnp.int32),
    }


def adam_step(params, grads, state, lrs, step=None):
    """One Adam update. ``lrs`` mirrors the params tree prefix: a dict with
    the same top-level keys, values float or schedule(step)->lr.

    Returns (new_params, new_state)."""
    count = state["count"] + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - B1**t
    bc2 = 1.0 - B2**t
    if step is None:
        step = count

    def leaf_lr(spec):
        return spec(step) if callable(spec) else jnp.asarray(spec, jnp.float32)

    new_mu = jax.tree_util.tree_map(
        lambda m, g: B1 * m + (1 - B1) * g, state["mu"], grads
    )
    new_nu = jax.tree_util.tree_map(
        lambda v, g: B2 * v + (1 - B2) * g * g, state["nu"], grads
    )

    new_params = {}
    for k in params:
        lr = leaf_lr(lrs[k])
        new_params[k] = jax.tree_util.tree_map(
            lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + EPS),
            params[k],
            new_mu[k],
            new_nu[k],
        )
    return new_params, {"mu": new_mu, "nu": new_nu, "count": count}


def adam_step_grouped(params, grads, state, lrs, step=None):
    """adam_step over per-group FLATTENED leaves.

    Semantically identical to adam_step, but each top-level group's
    subtree (params, grads, mu, nu) is ravelled into one vector before
    the update and unravelled after. For many-small-leaf trees (the
    appearance net: ~26 conv kernels/biases) the per-leaf formulation
    compiles to ~26 tiny fusions that each stall on a cross-memory copy
    (~5 ms/step measured on TPU); one fused vector update per group
    removes the stalls. State layout in/out is unchanged (checkpoints,
    surgery, tests unaffected); the ravel/unravel is pure reshapes +
    concats (~8 MB/step at appearance scale, negligible)."""
    from jax.flatten_util import ravel_pytree

    count = state["count"] + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - B1**t
    bc2 = 1.0 - B2**t
    if step is None:
        step = count

    new_params, new_mu, new_nu = {}, {}, {}
    for k in params:
        lr = lrs[k](step) if callable(lrs[k]) else jnp.asarray(
            lrs[k], jnp.float32)
        p, unravel = ravel_pytree(params[k])
        g, _ = ravel_pytree(grads[k])
        m, _ = ravel_pytree(state["mu"][k])
        v, _ = ravel_pytree(state["nu"][k])
        m = B1 * m + (1 - B1) * g
        v = B2 * v + (1 - B2) * g * g
        p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + EPS)
        new_params[k] = unravel(p)
        new_mu[k] = unravel(m)
        new_nu[k] = unravel(v)
    return new_params, {"mu": new_mu, "nu": new_nu, "count": count}


def zero_moments(state, written_mask, keys=None):
    """Zero Adam moments at slots flagged in ``written_mask`` (C,) —
    the densification optimizer-state surgery. ``keys`` limits which
    top-level param groups are touched (None = all with leading dim C)."""

    c = written_mask.shape[0]

    def z(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == c:
            m = written_mask.reshape((c,) + (1,) * (leaf.ndim - 1))
            return jnp.where(m, 0.0, leaf)
        return leaf

    def apply(tree):
        if keys is None:
            return jax.tree_util.tree_map(z, tree)
        out = dict(tree)
        for k in keys:
            out[k] = jax.tree_util.tree_map(z, tree[k])
        return out

    return {
        "mu": apply(state["mu"]),
        "nu": apply(state["nu"]),
        "count": state["count"],
    }
