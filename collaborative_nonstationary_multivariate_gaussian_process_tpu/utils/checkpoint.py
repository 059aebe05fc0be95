"""Checkpoint save/resume for training state.

Replaces the reference's `torch.save({'epoch', 'model_state_dict',
'optimizer_state_dict', 'loss'}, PATH)` + `torch.load` resume
(/root/reference/code/nmgp_dsvi.py:789-792,893-899).

Two backends:
  - "pickle" (default): one flat-numpy file — fast, portable, single-host.
  - "orbax": `orbax.checkpoint` directory checkpoints — atomic writes and
    multi-host/pod-safe restore (each host writes its process-local shards);
    the production path for distributed training.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Tuple

import jax
import numpy as np

__all__ = ["save_train_state", "load_train_state", "save_pytree", "load_pytree"]

# Wall-clock of the most recent save/load in this process.  At ECoG M=200
# the train state is ~1 GB (params + Adam moments dominated by the
# (G, M, M) sqrt_U table) and every leaf must be fetched through the axon
# tunnel before pickling, so checkpoint IO can rival training time itself;
# drivers surface these numbers in their artifacts (run_workload.py).
LAST_IO_SECONDS = {"save": None, "load": None}


def _to_numpy_tree(tree):
    # one device_get for the whole tree: the runtime can overlap/batch the
    # transfers, where per-leaf np.asarray serializes a blocking fetch per
    # leaf — material at ECoG M=200 where the train state is ~1 GB and
    # every byte crosses the axon tunnel
    return jax.device_get(tree)


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


def _cast_float_leaves(tree, dtype):
    """Cast floating leaves of `tree` to `dtype` ON DEVICE (before any
    fetch), leaving ints/bools (e.g. Adam's step count) untouched."""
    import jax.numpy as jnp

    def cast(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(dtype)
        return a

    return jax.tree_util.tree_map(cast, tree)


def _restore_leaf_dtypes(tree, like):
    """Cast each loaded leaf back to the dtype its `like` counterpart has
    (undoes `moments_dtype` down-casting at load time so a resumed run
    keeps its optimizer's native precision)."""

    def fix(a, r):
        if (
            hasattr(a, "dtype")
            and hasattr(r, "dtype")
            and a.dtype != r.dtype
        ):
            return np.asarray(a, dtype=r.dtype)
        return a

    return jax.tree_util.tree_map(fix, tree, like)


def save_train_state(
    path: str, params, opt_state, epoch: int = 0, loss: float = 0.0,
    backend: str = "pickle", moments_dtype=None,
):
    """`moments_dtype` (e.g. jnp.bfloat16) down-casts the optimizer
    state's floating leaves ON DEVICE before the device_get, halving the
    dominant cost of a large-state save — the ~7 MB/s axon-tunnel fetch
    of the Adam moments (docs/DESIGN.md §17.3; M=200 state is ~1 GB and
    the moments are two-thirds of it).  Params always save full
    precision; `load_train_state` restores the moments to the dtype of
    the `opt_state_like` it is given (bf16 quantization of second
    moments perturbs the next update by ~2^-8 relative — the same
    tolerance class as `optimizer="adam_bf16"`, which already stores
    moments bf16 on device and makes this cast a no-op)."""
    import time as _time

    _t0 = _time.time()
    try:
        if moments_dtype is not None:
            opt_state = _cast_float_leaves(opt_state, moments_dtype)
        return _save_train_state(path, params, opt_state, epoch, loss, backend)
    finally:
        LAST_IO_SECONDS["save"] = _time.time() - _t0


def _save_train_state(path, params, opt_state, epoch, loss, backend):
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(
            os.path.abspath(path),
            {
                "epoch": np.asarray(epoch),
                "loss": np.asarray(loss),
                "params": _to_numpy_tree(params),
                "opt_state": _to_numpy_tree(opt_state),
            },
            force=True,
        )
        return
    state = {
        "epoch": epoch,
        "loss": loss,
        "params": jax.tree_util.tree_flatten(_to_numpy_tree(params))[0],
        "opt_state": jax.tree_util.tree_flatten(_to_numpy_tree(opt_state))[0],
    }
    with open(path, "wb") as f:
        pickle.dump(state, f)


def load_train_state(
    path: str, params_like, opt_state_like, backend: str = "pickle"
) -> Tuple[Any, Any]:
    import time as _time

    _t0 = _time.time()
    try:
        return _load_train_state(path, params_like, opt_state_like, backend)
    finally:
        LAST_IO_SECONDS["load"] = _time.time() - _t0


def _load_train_state(path, params_like, opt_state_like, backend):
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        state = ckptr.restore(
            os.path.abspath(path),
            item={
                "epoch": np.asarray(0),
                "loss": np.asarray(0.0),
                "params": _to_numpy_tree(params_like),
                "opt_state": _to_numpy_tree(opt_state_like),
            },
        )
        p_def = jax.tree_util.tree_structure(params_like)
        o_def = jax.tree_util.tree_structure(opt_state_like)
        params = jax.tree_util.tree_unflatten(
            p_def, jax.tree_util.tree_leaves(state["params"])
        )
        opt_state = jax.tree_util.tree_unflatten(
            o_def, jax.tree_util.tree_leaves(state["opt_state"])
        )
        return params, opt_state
    with open(path, "rb") as f:
        state = pickle.load(f)
    p_def = jax.tree_util.tree_structure(params_like)
    o_def = jax.tree_util.tree_structure(opt_state_like)
    params = jax.tree_util.tree_unflatten(p_def, state["params"])
    opt_state = jax.tree_util.tree_unflatten(o_def, state["opt_state"])
    params = _migrate_layout(params, params_like)
    opt_state = _migrate_layout(opt_state, opt_state_like)
    params = _restore_leaf_dtypes(params, params_like)
    opt_state = _restore_leaf_dtypes(opt_state, opt_state_like)
    return params, opt_state


def _migrate_layout(tree, like):
    """Migrate legacy checkpoint layouts to the current one.

    Checkpoints written before the packed-U layout change hold dense
    (D, D, M[, M]) `mu_U`/`sqrt_U` leaves (and matching Adam moments) where
    the current layout expects packed (D(D+1)/2, M[, M]).  Detect the
    dense->packed pattern per leaf and apply `pack_U`; any other shape
    mismatch raises a clear error instead of failing opaquely downstream."""
    from ..models.cnmgp import pack_U

    def fix(leaf, ref):
        leaf = np.asarray(leaf)
        rs = tuple(np.shape(ref))
        if leaf.shape == rs:
            return leaf
        if (
            leaf.ndim == len(rs) + 1
            and leaf.ndim >= 2
            and leaf.shape[0] == leaf.shape[1]
            and leaf.shape[0] * (leaf.shape[0] + 1) // 2 == rs[0]
            and leaf.shape[2:] == rs[1:]
        ):
            return np.asarray(pack_U(leaf))
        raise ValueError(
            f"checkpoint leaf shape {leaf.shape} does not match current "
            f"layout {rs} — unsupported legacy checkpoint layout"
        )

    return jax.tree_util.tree_map(fix, tree, like)
