"""Full-state checkpoints: the reference's `torch.save((capture(), iter))`
(train.py:160-162, gaussian_model.py:68-100) in two interchangeable
backends:

- flat npz (default): single portable file, exact round-trip;
- orbax (SURVEY §5's TPU-native equivalent): async-capable, sharding-aware
  directory checkpoints — the right choice for multi-host fleets where
  every process must write its own shard. Selected by path convention:
  a path ending in ``.npz`` uses npz, anything else uses orbax.

Both restore exactly (params, appearance, both Adam states, alive mask,
densify accumulators) with leaf count/shape validation."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(state) -> Tuple[dict, "jax.tree_util.PyTreeDef"]:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}, treedef


def save(path: str, state, iteration: int) -> None:
    if not path.endswith(".npz"):
        return _save_orbax(path, state, iteration)
    arrs, _ = _flatten(state)
    arrs["__iteration__"] = np.asarray(iteration)
    np.savez_compressed(path, **arrs)


def _save_orbax(path: str, state, iteration: int) -> None:
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(path),
            {"state": state, "iteration": np.asarray(iteration)},
            force=True,
        )


def _load_orbax(path: str, template) -> Tuple[object, int]:
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path),
            {"state": template, "iteration": np.asarray(0)},
        )
    return restored["state"], int(restored["iteration"])


def load(path: str, template) -> Tuple[object, int]:
    """``template`` is a TrainState with the right structure/shapes (e.g. a
    freshly initialised one); returns (state, iteration)."""
    if not path.endswith(".npz"):
        return _load_orbax(path, template)
    data = np.load(path)
    iteration = int(data["__iteration__"])
    leaves, treedef = jax.tree_util.tree_flatten(template)
    n_saved = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_saved != len(leaves):
        raise ValueError(
            f"checkpoint {path!r} has {n_saved} leaves but the template has "
            f"{len(leaves)} — was it saved with a different capacity or "
            "use_appearance setting?"
        )
    new_leaves = []
    for i, l in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        tshape = tuple(getattr(l, "shape", arr.shape))
        if tuple(arr.shape) != tshape:
            raise ValueError(
                f"checkpoint {path!r} leaf {i} has shape {tuple(arr.shape)} "
                f"but the template expects {tshape} — capacity or model "
                "config mismatch"
            )
        new_leaves.append(
            jnp.asarray(arr, l.dtype if hasattr(l, "dtype") else None)
        )
    return jax.tree_util.tree_unflatten(treedef, new_leaves), iteration
