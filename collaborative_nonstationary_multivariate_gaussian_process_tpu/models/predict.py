"""Posterior-predictive API for the DSVI model.

Replaces the reference's module-level `sample_Y` / `sample_FY` / `predict_Y`
wrappers (/root/reference/code/nmgp_dsvi.py:912-930): a single jitted draw
function vmapped over S sample keys, instead of a Python loop that rebuilds
every kernel per draw (nmgp_dsvi.py:435-486).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DSVI_JITTER
from . import cnmgp
from .cnmgp import CNMGPParams

__all__ = ["sample_Y", "sample_FY", "predict_Y"]

# Draws per XLA dispatch in the vmapped samplers.  Each draw materializes
# the per-group conditioning intermediates (O(D^2 * B * M) floats at ECoG
# scale); an unchunked vmap over hundreds of keys OOMs the 16 GB chip
# (observed: 16.4 GB for 32 draws at D=78/M=200/B=62k) and violates the
# bounded-dispatch budget (docs/DESIGN.md §7).  Chunks share one compile.
DRAWS_PER_DISPATCH = 8


def _chunked_draws(draw_fn, keys, n_out):
    """Run `draw_fn(keys_chunk)` in DRAWS_PER_DISPATCH-sized chunks and
    np-concatenate the outputs (one compile for full chunks + at most one
    ragged tail)."""
    outs = [[] for _ in range(n_out)]
    n = keys.shape[0]
    step = DRAWS_PER_DISPATCH
    for start in range(0, n, step):
        res = draw_fn(keys[start : start + step])
        for acc, r in zip(outs, res):
            acc.append(np.asarray(r))
    return tuple(np.concatenate(a, axis=0) for a in outs)


def _flat_inputs(X_list: Sequence, index: Optional[Sequence[int]], dtype):
    xs, idxs = [], []
    for d, x in enumerate(X_list):
        x = np.asarray(x).reshape(-1)
        out_d = index[d] if index is not None else d
        xs.append(x)
        idxs.append(np.full(x.shape[0], out_d, dtype=np.int32))
    return (
        jnp.asarray(np.concatenate(xs), dtype),
        jnp.asarray(np.concatenate(idxs)),
    )


def sample_Y(
    params: CNMGPParams,
    Z,
    X_list: Sequence,
    index: Optional[Sequence[int]] = None,
    n_sample: int = 1000,
    seed: int = 0,
    jitter: float = DSVI_JITTER,
    kl_mode: str = "true",
):
    """S posterior predictive draws at heterotopic inputs.

    Returns (Ys (S, B), Ls (S, B, D), Gs (S, D, B), tilde_ells (S, B)) —
    same contents as reference `NMGP.sample_Y` (nmgp_dsvi.py:406-491).
    """
    Z = jnp.asarray(Z).reshape(-1)
    x, idx = _flat_inputs(X_list, index, Z.dtype)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_sample)
    draw = jax.jit(
        jax.vmap(
            partial(cnmgp.sample_y_once, jitter=jitter, kl_mode=kl_mode),
            in_axes=(None, None, None, None, 0),
        )
    )
    return _chunked_draws(lambda k: draw(params, Z, x, idx, k), keys, 4)


def sample_FY(
    params: CNMGPParams,
    Z,
    x,
    n_sample: int = 1000,
    seed: int = 0,
    jitter: float = DSVI_JITTER,
    kl_mode: str = "true",
):
    """S draws of (tilde_ell, all-output Y, correlation process) at common
    inputs x.  Matches reference `NMGP.sample_FY` (nmgp_dsvi.py:493-580):
    returns (tilde_ells (S, B), Ys (S, B, D), corrs (S, B, D, D))."""
    Z = jnp.asarray(Z).reshape(-1)
    x = jnp.asarray(np.asarray(x).reshape(-1), Z.dtype)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_sample)
    draw = jax.jit(
        jax.vmap(
            partial(cnmgp.sample_fy_once, jitter=jitter, kl_mode=kl_mode),
            in_axes=(None, None, None, 0),
        )
    )
    return _chunked_draws(lambda k: draw(params, Z, x, k), keys, 3)


def predict_Y(
    params: CNMGPParams,
    Z,
    X_list: Sequence,
    index: Optional[Sequence[int]] = None,
    jitter: float = DSVI_JITTER,
):
    """Plug-in posterior-mean prediction (reference predict_Y,
    nmgp_dsvi.py:666-722,927-930)."""
    Z = jnp.asarray(Z).reshape(-1)
    x, idx = _flat_inputs(X_list, index, Z.dtype)
    est = jax.jit(partial(cnmgp.predict_y_mean, jitter=jitter))(params, Z, x, idx)
    return np.asarray(est)
