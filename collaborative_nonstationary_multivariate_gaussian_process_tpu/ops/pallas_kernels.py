"""Pallas TPU kernels for the hot covariance builds.

BASELINE.json names the Gibbs/nonstationary kernel construction as a fused-
kernel target.  The builds are transcendental-heavy elementwise maps over an
(N, M) grid fed by row/column vectors; the Pallas versions tile them through
VMEM in (128, 128) blocks, fusing pairwise-distance, lengthscale mixing, and
exp into one pass so HBM sees each tile exactly once.

Forward kernels carry a custom VJP whose backward is a closed-form jnp
expression (XLA fuses it into one kernel of the same shape); gradients flow
to the lengthscale vectors and the scale — exactly what the CNMGP ELBO
differentiates (x inputs are data).

Set `interpret=True` (or run under `pltpu.force_tpu_interpret_mode`) for
CPU-based tests.

Reference semantics: `create_Gibbs` (code/utils.py:97-103) and `create_RBF`
(code/utils.py:91-94).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gibbs_pallas", "rbf_pallas"]

_TILE = 128


def _pad_to(x, n, fill):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])


def _gibbs_kernel_body(x1_ref, l1_ref, x2_ref, l2_ref, s_ref, out_ref):
    x1 = x1_ref[:]  # (TILE, 1)
    l1 = l1_ref[:]
    x2 = x2_ref[:]  # (1, TILE)
    l2 = l2_ref[:]
    s = s_ref[0, 0]
    d = x1 - x2
    a2 = l1 * l1
    b2 = l2 * l2
    denom = a2 + b2
    inv = 1.0 / denom
    pref = jnp.sqrt(2.0 * (l1 * l2) * inv)
    out_ref[:] = s * pref * jnp.exp(-(d * d) * inv)


def _rbf_kernel_body(x1_ref, x2_ref, p_ref, out_ref):
    x1 = x1_ref[:]
    x2 = x2_ref[:]
    s = p_ref[0, 0]
    inv2l2 = p_ref[0, 1]  # 0.5 / length_scale**2
    d = x1 - x2
    out_ref[:] = s * jnp.exp(-(d * d) * inv2l2)


def _tiled_call(body, ins, n, m, dtype, interpret):
    grid = (pl.cdiv(n, _TILE), pl.cdiv(m, _TILE))
    np_, mp = grid[0] * _TILE, grid[1] * _TILE
    row_spec = pl.BlockSpec((_TILE, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, _TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[row_spec] * (ins["n_row"]) + [col_spec] * (ins["n_col"])
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, mp), dtype),
        interpret=interpret,
    )(*ins["args"])
    return out[:n, :m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gibbs_pallas(x1, x2, ell1, ell2, scale2, interpret=False):
    """Fused Gibbs cross-covariance build, (N,) x (M,) -> (N, M).

    Same math as ops.kernels.gibbs for 1-D inputs.  `scale2` is a scalar.
    """
    return _gibbs_forward(x1, x2, ell1, ell2, scale2, interpret)


def _gibbs_forward(x1, x2, ell1, ell2, scale2, interpret):
    n, m = x1.shape[0], x2.shape[0]
    dtype = x1.dtype
    grid_n = pl.cdiv(n, _TILE) * _TILE
    grid_m = pl.cdiv(m, _TILE) * _TILE
    x1p = _pad_to(x1, grid_n, 0.0)[:, None]
    l1p = _pad_to(ell1, grid_n, 1.0)[:, None]
    x2p = _pad_to(x2, grid_m, 0.0)[None, :]
    l2p = _pad_to(ell2, grid_m, 1.0)[None, :]
    s = jnp.asarray(scale2, dtype).reshape(1, 1)
    ins = dict(n_row=2, n_col=2, args=(x1p, l1p, x2p, l2p, s))
    return _tiled_call(_gibbs_kernel_body, ins, n, m, dtype, interpret)


def _gibbs_fwd(x1, x2, ell1, ell2, scale2, interpret):
    K = _gibbs_forward(x1, x2, ell1, ell2, scale2, interpret)
    return K, (x1, x2, ell1, ell2, scale2, K)


def _gibbs_bwd(interpret, res, g):
    x1, x2, ell1, ell2, scale2, K = res
    a = ell1[:, None]
    b = ell2[None, :]
    d = x1[:, None] - x2[None, :]
    A = a * a + b * b
    invA = 1.0 / A
    gK = g * K
    # d k / d a = k (0.5/a - a/A + 2 a d^2 / A^2)
    d_ell1 = jnp.sum(gK * (0.5 / a - a * invA + 2.0 * a * d * d * invA * invA), axis=1)
    d_ell2 = jnp.sum(gK * (0.5 / b - b * invA + 2.0 * b * d * d * invA * invA), axis=0)
    # d k / d x1 = k * (-2 d / A)
    dx_common = gK * (-2.0 * d * invA)
    d_x1 = jnp.sum(dx_common, axis=1)
    d_x2 = -jnp.sum(dx_common, axis=0)
    d_scale2 = jnp.sum(gK) / scale2
    return d_x1, d_x2, d_ell1, d_ell2, d_scale2


gibbs_pallas.defvjp(_gibbs_fwd, _gibbs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def rbf_pallas(x1, x2, scale2, length_scale, interpret=False):
    """Fused stationary RBF build, (N,) x (M,) -> (N, M)."""
    return _rbf_forward(x1, x2, scale2, length_scale, interpret)


def _rbf_forward(x1, x2, scale2, length_scale, interpret):
    n, m = x1.shape[0], x2.shape[0]
    dtype = x1.dtype
    grid_n = pl.cdiv(n, _TILE) * _TILE
    grid_m = pl.cdiv(m, _TILE) * _TILE
    x1p = _pad_to(x1, grid_n, 0.0)[:, None]
    x2p = _pad_to(x2, grid_m, 0.0)[None, :]
    p = jnp.stack(
        [jnp.asarray(scale2, dtype), 0.5 / jnp.asarray(length_scale, dtype) ** 2]
    ).reshape(1, 2)
    ins = dict(n_row=1, n_col=1, args=(x1p, x2p, p))
    return _tiled_call(_rbf_kernel_body, ins, n, m, dtype, interpret)


def _rbf_fwd(x1, x2, scale2, length_scale, interpret):
    K = _rbf_forward(x1, x2, scale2, length_scale, interpret)
    return K, (x1, x2, scale2, length_scale, K)


def _rbf_bwd(interpret, res, g):
    x1, x2, scale2, length_scale, K = res
    d = x1[:, None] - x2[None, :]
    l2 = length_scale**2
    gK = g * K
    d_scale2 = jnp.sum(gK) / scale2
    common = gK * (-d / l2)
    d_x1 = jnp.sum(common, axis=1)
    d_x2 = -jnp.sum(common, axis=0)
    d_ls = jnp.sum(gK * d * d) / (l2 * length_scale)
    return d_x1, d_x2, d_scale2, d_ls


rbf_pallas.defvjp(_rbf_fwd, _rbf_bwd)
