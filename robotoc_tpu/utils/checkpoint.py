"""Checkpoint / resume of solver state.

The reference has no persistence (SURVEY.md §5: warm-starting only). Here any
solver state — Solution pytrees, GridData, schedules — round-trips through a
single .npz file: leaves are saved by flattened index and re-attached to a
template pytree of the same structure.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save(path: str, pytree) -> None:
    leaves = jax.tree.leaves(pytree)
    np.savez(path, **{f"leaf_{i}": np.asarray(x)
                      for i, x in enumerate(leaves)})


def load(path: str, template):
    """Load into the structure of `template` (dtypes follow the template)."""
    data = np.load(path)
    leaves_t, treedef = jax.tree.flatten(template)
    leaves = []
    for i, lt in enumerate(leaves_t):
        arr = data[f"leaf_{i}"]
        leaves.append(jnp.asarray(arr, getattr(lt, "dtype", None)))
    return jax.tree.unflatten(treedef, leaves)
