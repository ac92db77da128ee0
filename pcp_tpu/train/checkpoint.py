"""Full-state checkpoints: the reference's `torch.save((capture(), iter))`
(train.py:160-162, gaussian_model.py:68-100) as a flat npz of the TrainState
pytree. Restores exactly (params, appearance, both Adam states, alive mask,
densify accumulators)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(state) -> Tuple[dict, "jax.tree_util.PyTreeDef"]:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}, treedef


def save(path: str, state, iteration: int) -> None:
    arrs, _ = _flatten(state)
    arrs["__iteration__"] = np.asarray(iteration)
    np.savez_compressed(path, **arrs)


def load(path: str, template) -> Tuple[object, int]:
    """``template`` is a TrainState with the right structure/shapes (e.g. a
    freshly initialised one); returns (state, iteration)."""
    data = np.load(path)
    iteration = int(data["__iteration__"])
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = [
        jnp.asarray(data[f"leaf_{i}"], l.dtype if hasattr(l, "dtype") else None)
        for i, l in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), iteration
