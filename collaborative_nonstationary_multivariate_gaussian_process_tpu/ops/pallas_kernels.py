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
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "gibbs_pallas",
    "rbf_pallas",
    "kron_mv_pallas",
    "cholesky_pallas",
    "chol_inv_pallas",
    "quadform_diag_pallas",
]

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


# ---------------------------------------------------------------------------
# Fused Kronecker matvec: (B ⊗ K) y = vec(K Y Bᵀ)
# ---------------------------------------------------------------------------


def kron_mv_pallas(B, K, y, interpret=False):
    """(B ⊗ K) y without materializing the (N1, M2) intermediate in HBM.

    B: (M1, M2) small task matrix; K: (N1, N2) large input matrix;
    y: (M2*N2,) task-major.  The reference's `kron_mv`
    (kronecker_operation.py:72-85) is two GEMMs with an HBM round-trip for
    K @ Y; here each K row-block's (TILE, M2) product stays in VMEM and is
    immediately contracted with Bᵀ — one HBM pass over K for the small-M
    regimes of this model family (M = #outputs ≤ ~16).
    Returns (M1*N1,).
    """
    m1, m2 = B.shape
    n1, n2 = K.shape
    dtype = K.dtype
    Y = y.reshape(m2, n2).T  # (N2, M2)

    grid_n = pl.cdiv(n1, _TILE)
    n1p = grid_n * _TILE
    if n1p != n1:
        K = jnp.concatenate([K, jnp.zeros((n1p - n1, n2), dtype)], axis=0)
    # pad the small task dims to the 128-lane floor (zero-padding is exact)
    mp = _TILE
    Yp = jnp.zeros((n2, mp), dtype).at[:, :m2].set(Y)
    BTp = jnp.zeros((mp, mp), dtype).at[:m2, :m1].set(B.T)

    acc_t = jnp.float32 if dtype == jnp.float32 else dtype

    def body(k_ref, y_ref, bt_ref, out_ref):
        kb = k_ref[:]  # (TILE, N2)
        yb = y_ref[:]  # (N2, mp)
        bt = bt_ref[:]  # (mp, mp)
        t = jnp.dot(kb, yb, preferred_element_type=acc_t)
        out_ref[:] = jnp.dot(t, bt, preferred_element_type=acc_t).astype(dtype)

    out = pl.pallas_call(
        body,
        grid=(grid_n,),
        in_specs=[
            pl.BlockSpec((_TILE, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, mp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n1p, mp), dtype),
        interpret=interpret,
    )(K, Yp, BTp)
    return out[:n1, :m1].T.reshape(-1)


# ---------------------------------------------------------------------------
# Batched Cholesky: one VMEM-resident factorization per grid program
# ---------------------------------------------------------------------------


def _chol_kernel_body(a_ref, out_ref):
    """Right-looking Cholesky of one (Mp, Mp) tile, fully in VMEM.

    Each of the M iterations does a full-matrix masked rank-1 update — an
    O(M^2) VPU op — so the work is vector-parallel even though the column
    recurrence is sequential (Cholesky's intrinsic critical path).
    """
    mp = a_ref.shape[-1]
    A0 = a_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)

    def col_step(j, carry):
        # Mosaic has no dynamic_slice on values and is picky about 1-D
        # vectors: extract column j and the pivot with fully 2-D masked
        # reductions (O(M^2) VPU work, same order as the rank-1 update).
        A, L = carry
        col_mask = cols == j
        colj = jnp.sum(jnp.where(col_mask, A, 0.0), axis=1, keepdims=True)  # (mp,1)
        a_jj = jnp.sum(jnp.where(jnp.logical_and(col_mask, rows == j), A, 0.0))
        d = jax.lax.rsqrt(jnp.maximum(a_jj, 1e-30))
        colj = jnp.where(rows[:, :1] >= j, colj * d, 0.0)  # (mp,1)
        L = jnp.where(col_mask, colj, L)
        A = A - colj * colj.reshape(1, mp)
        return (A, L)

    _, L = jax.lax.fori_loop(0, mp, col_step, (A0, jnp.zeros_like(A0)))
    out_ref[0] = jnp.where(rows >= cols, L, 0.0)


def cholesky_pallas(A, interpret=False):
    """Batched lower Cholesky of (..., M, M) SPD matrices, M <= 512.

    BASELINE.json names batched small-Cholesky a fused-kernel target: the
    M x M inducing-point blocks (M ~ 100) factor entirely in VMEM, one
    matrix per grid program, with the batch as the grid.  Differentiable
    via the standard Cholesky pullback expressed on the Pallas forward
    (tests check it against jnp.linalg.cholesky's VJP).
    """
    return _chol_forward(A, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _chol_forward(A, interpret=False):
    batch_shape = A.shape[:-2]
    m = A.shape[-1]
    # pad to the dtype tile floor
    mp = max(8, ((m + 7) // 8) * 8)
    Ab = A.reshape((-1, m, m))
    nb = Ab.shape[0]
    if mp != m:
        eye_pad = jnp.eye(mp, dtype=A.dtype)
        Ap = jnp.tile(eye_pad[None], (nb, 1, 1))
        Ap = Ap.at[:, :m, :m].set(Ab)
    else:
        Ap = Ab
    out = pl.pallas_call(
        _chol_kernel_body,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, mp, mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, mp, mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, mp, mp), A.dtype),
        interpret=interpret,
    )(Ap)
    return out[:, :m, :m].reshape(batch_shape + (m, m))


def _chol_inv_kernel_body(a_ref, l_ref, linv_ref):
    """Fused (L, L^{-1}) of one (Mp, Mp) SPD tile, fully in VMEM.

    The right-looking column sweep of `_chol_kernel_body` interleaved with
    forward substitution: once column j of L is final, row j of L is also
    final (columns k <= j wrote it at steps k), so the inverse row
        L^{-1}[j, :] = (e_j - L[j, :j] @ L^{-1}[:j, :]) / l_jj
    is computable in the same iteration.  The row contraction runs as a
    (1, Mp) x (Mp, Mp) MXU matmul (rows >= j of L^{-1} are still zero, so no
    masking of the contraction operand is needed).  One kernel replaces the
    two latency-bound XLA ops of the DSVI hot path (batched Cholesky +
    batched triangular inverse, see ops/linalg.chol_tri_inv).
    """
    mp = a_ref.shape[-1]
    A0 = a_ref[0]
    dt = A0.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)
    acc_t = dt if dt == jnp.float64 else jnp.float32

    def col_step(j, carry):
        A, L, Linv = carry
        col_mask = cols == j
        colj = jnp.sum(jnp.where(col_mask, A, 0.0), axis=1, keepdims=True)  # (mp,1)
        a_jj = jnp.sum(jnp.where(jnp.logical_and(col_mask, rows == j), A, 0.0))
        d = jax.lax.rsqrt(jnp.maximum(a_jj, 1e-30))  # = 1 / l_jj
        colj = jnp.where(rows[:, :1] >= j, colj * d, 0.0)  # (mp,1) column j of L
        L = jnp.where(col_mask, colj, L)
        A = A - colj * colj.reshape(1, mp)
        # inverse row j (forward substitution against the finished rows < j)
        row_mask = rows == j
        rowj = jnp.sum(jnp.where(row_mask, L, 0.0), axis=0, keepdims=True)  # (1,mp)
        rowj_off = jnp.where(cols[:1, :] == j, 0.0, rowj)  # drop the diagonal
        t = jnp.dot(rowj_off, Linv, preferred_element_type=acc_t).astype(dt)
        ej = jnp.where(cols[:1, :] == j, 1.0, 0.0).astype(dt)
        linv_rowj = (ej - t) * d  # (1, mp)
        Linv = jnp.where(row_mask, linv_rowj, Linv)
        return (A, L, Linv)

    _, L, Linv = jax.lax.fori_loop(
        0, mp, col_step, (A0, jnp.zeros_like(A0), jnp.zeros_like(A0))
    )
    lower = rows >= cols
    l_ref[0] = jnp.where(lower, L, 0.0)
    linv_ref[0] = jnp.where(lower, Linv, 0.0)


def chol_inv_pallas(A, interpret=False):
    """Batched fused (L, L^{-1}) of (..., M, M) SPD matrices, M <= 512.

    Returns the same values as `ops.linalg.chol_tri_inv`'s forward (one
    batched Cholesky + one batched triangular inverse) in a single Pallas
    kernel, one matrix per grid program.  NOT differentiable on its own.
    Padding note: padded tail columns are identity (diag 1), which the
    recurrence preserves exactly for both outputs.

    Measured (v5e, f32, batch=4, M=100 — the DSVI hot-path shape): 161 us
    vs 59 us for XLA's batched Cholesky + triangular-inverse pair inside
    the same scan, so the hot path does NOT dispatch here: four sequential
    grid programs each walking a 100-step column recurrence (with an MXU
    (1,M)x(M,M) matmul per step) lose to XLA's batched pipeline at this
    tiny batch.  Kept for larger batches / as the building block for a
    future multi-matrix-per-program variant.
    """
    batch_shape = A.shape[:-2]
    m = A.shape[-1]
    mp = max(8, ((m + 7) // 8) * 8)
    Ab = A.reshape((-1, m, m))
    nb = Ab.shape[0]
    if mp != m:
        eye_pad = jnp.eye(mp, dtype=A.dtype)
        Ap = jnp.tile(eye_pad[None], (nb, 1, 1))
        Ap = Ap.at[:, :m, :m].set(Ab)
    else:
        Ap = Ab
    spec = pl.BlockSpec((1, mp, mp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    L, Linv = pl.pallas_call(
        _chol_inv_kernel_body,
        grid=(nb,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((nb, mp, mp), A.dtype),
            jax.ShapeDtypeStruct((nb, mp, mp), A.dtype),
        ),
        interpret=interpret,
    )(Ap)
    crop = lambda X: X[:, :m, :m].reshape(batch_shape + (m, m))
    return crop(L), crop(Linv)


def _chol_fwd(A, interpret):
    L = _chol_forward(A, interpret)
    return L, L


def _chol_bwd(interpret, L, Lbar):
    """Cholesky pullback (Murray 2016): Ā = ½ L⁻ᵀ (Φ(Lᵀ L̄) + Φ(Lᵀ L̄)ᵀ) L⁻¹
    with Φ = tril with halved diagonal."""
    import jax.scipy.linalg as jsl

    m = L.shape[-1]
    P = jnp.einsum("...ji,...jk->...ik", L, Lbar)
    tri = jnp.tril(jnp.ones((m, m), L.dtype)) - 0.5 * jnp.eye(m, dtype=L.dtype)
    phi = P * tri
    sym = 0.5 * (phi + jnp.swapaxes(phi, -1, -2))

    batch = L.shape[:-2]
    Lf = L.reshape((-1, m, m))
    Sf = sym.reshape((-1, m, m))

    def pull(l, s):
        # Abar = L^{-T} s L^{-1}
        t1 = jsl.solve_triangular(l, s, lower=True, trans="T")  # L^{-T} s
        t2 = jsl.solve_triangular(l, t1.T, lower=True, trans="T").T  # t1 L^{-1}
        return t2

    Abar = jax.vmap(pull)(Lf, Sf).reshape(batch + (m, m))
    return (Abar,)


_chol_forward.defvjp(_chol_fwd, _chol_bwd)


# ---------------------------------------------------------------------------
# Fused batched quadratic-form diagonal: V[g, n] = || W[g]^T A[:, n] ||^2
# ---------------------------------------------------------------------------
#
# The ECoG-scale ELBO hot spot (docs/DESIGN.md §8): `mgp_mean_var_white`
# computes per-point variances  sum_k (A^T W)^2  for G = D(D+1)/2 variational
# groups sharing one half-projection A = Lp^{-1} K12^T.  The XLA lowering
# materializes C = einsum("mn,gmk->gnk") to HBM — (G, N, M) f32 is ~615 MB at
# ECoG scale (G=3003, N=512, M=100) — then reads it back for the square-
# reduce, and the VJP re-streams it twice more; arithmetic intensity ~23
# flops/byte, far below the v5e ridge (~240), so the op is HBM-bound.  This
# kernel keeps every C tile in VMEM: HBM sees W once (plus A and the (G, N)
# output), a ~10x traffic cut.  The backward recomputes C tile-wise
# (flash-attention-style rematerialization) in two accumulating kernels.
#
# MOSAIC LOWERING CONSTRAINTS (all learned on real hardware; interpret mode
# enforces none of them):
#   * reshapes/transposes that relayout across lanes are rejected
#     ("unsupported shape cast"), so the (G, M, M) operand cannot be
#     flattened *inside* the kernel;
#   * transposed-LHS dots (contract lhs dim 0) insert a per-dot relayout
#     (+320 us for a 1024x1024 operand, measured);
#   * a static Python loop of small per-group dots pays ~75 us/dot of
#     pipeline overhead (measured: 8 x (128,128)@(128,512) is 3.2x slower
#     than the one fused dot of equal FLOPs);
#   * output block dims must be sublane(8)/lane(128)-divisible or span the
#     full array dim — a (1, TN) block is rejected.
#
# Design that satisfies all four: flatten W OUTSIDE the kernel (XLA handles
# the relayout in HBM at bandwidth cost) into
#     WT[(g,k), m] = W[g, m, k]      (rows = group-major flattened k)
#     WM[m, (g,k)] = W[g, m, k]      (same entries, lane-major; dA only)
# and express every contraction as a plain NN matmul on 2D tiles:
#     C   = WT @ A                            ((GB*M, TN), the C tile)
#     V   = S  @ (C * C)                      (per-group sum over k)
#     vbe = ST @ vbar_tile                    (cotangent rows expanded to k)
#     dWT = (2 * vbe * C) @ A^T-tile          (A passed pre-transposed)
#     dA += WM @ (2 * vbe * C)
# where S (GB, GB*M) / ST (GB*M, GB) are constant 0/1 group-membership
# matrices (a block-diagonal selector; the MXU eats the zeros — 105 MFLOP
# vs the 328 MFLOP main dot at GB=32, ~2 us).
#
#   forward   grid (N-tiles, G-blocks):  A tile resident, WT streams once.
#   dWT       grid (G-blocks, N-tiles):  accumulates over the inner N sweep.
#   dA        grid (N-tiles, G-blocks):  accumulates over the inner G sweep.

_QF_TILE_N = 512  # forward N tile; backward halves it (two C-sized live tiles)


def _qf_g_block(m: int) -> int:
    """Groups per program block.

    GB must make GB*M lane-divisible (the dA kernel blocks WM on its minor
    dim: GB*M % 128 == 0) and GB itself sublane-divisible for the (GB, TN)
    V output block (GB % 8 == 0).  Smallest such GB: lcm of 8 and
    128/gcd(M, 128).  M=100 -> 32, M=200 -> 16, M=128 -> 8; the implied
    W block stays ~1-2 MiB — within VMEM at every M the models use.
    """
    g0 = 128 // math.gcd(m, 128)
    return max(8, g0 * 8 // math.gcd(g0, 8))


def _qf_pad_cols(A, npad):
    n = A.shape[1]
    if npad == n:
        return A
    return jnp.concatenate([A, jnp.zeros((A.shape[0], npad - n), A.dtype)], axis=1)


def _qf_pad_groups(W, gpad):
    g = W.shape[0]
    if gpad == g:
        return W
    return jnp.concatenate(
        [W, jnp.zeros((gpad - g,) + W.shape[1:], W.dtype)], axis=0
    )


def _qf_selectors(gb, m, dtype):
    """Constant 0/1 selector S (GB, GB*M) with S[g, (g', k)] = [g == g']."""
    s = np.equal.outer(np.arange(gb), np.repeat(np.arange(gb), m))
    return jnp.asarray(s.astype(dtype))


def _qf_fwd_body(wt_ref, a_ref, s_ref, out_ref):
    C = jax.lax.dot_general(
        wt_ref[:], a_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (GB*M, TN)
    out_ref[:] = jax.lax.dot_general(
        s_ref[:], C * C, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (GB, TN)


def _qf_dwt_body(wt_ref, a_ref, at_ref, vb_ref, st_ref, out_ref):
    j = pl.program_id(1)
    C = jax.lax.dot_general(
        wt_ref[:], a_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (GB*M, TN)
    vbe = jax.lax.dot_general(
        st_ref[:], vb_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (GB*M, TN)
    dwt = jax.lax.dot_general(
        2.0 * vbe * C, at_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (GB*M, M)

    @pl.when(j == 0)
    def _():
        out_ref[:] = dwt

    @pl.when(j > 0)
    def _():
        out_ref[:] += dwt


def _qf_da_body(wt_ref, wm_ref, a_ref, vb_ref, st_ref, out_ref):
    gg = pl.program_id(1)
    C = jax.lax.dot_general(
        wt_ref[:], a_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    vbe = jax.lax.dot_general(
        st_ref[:], vb_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    da = jax.lax.dot_general(
        wm_ref[:], 2.0 * vbe * C, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (M, TN)

    @pl.when(gg == 0)
    def _():
        out_ref[:] = da

    @pl.when(gg > 0)
    def _():
        out_ref[:] += da


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def quadform_diag_pallas(A, W, interpret=False):
    """V[g, n] = sum_k (sum_m A[m, n] W[g, m, k])^2, fused on TPU.

    A: (M, N) f32; W: (G, M, M) f32.  Returns (G, N).  Matches
    `jnp.sum(jnp.einsum("mn,gmk->gnk", A, W) ** 2, axis=-1)` without the
    (G, N, M) HBM intermediate.  Differentiable via Pallas backward kernels
    that rematerialize C tile-wise.
    """
    return _qf_forward(A, W, interpret)[0]


def _qf_tiles(m, n, g, tile_n):
    tn = min(tile_n, pl.cdiv(n, _TILE) * _TILE)
    npad = pl.cdiv(n, tn) * tn
    gb = _qf_g_block(m)
    gpad = pl.cdiv(g, gb) * gb
    return tn, npad, gb, gpad


def _qf_flatten_w(W, gpad):
    """(G, M, M) -> WT (gpad*M, M) rows (g, k), and the same entries as
    WM (M, gpad*M) — XLA-side relayouts (Mosaic can't do them in-kernel)."""
    m = W.shape[-1]
    Wp = _qf_pad_groups(W, gpad)
    WT = Wp.transpose(0, 2, 1).reshape(gpad * m, m)
    WM = Wp.transpose(1, 0, 2).reshape(m, gpad * m)
    return WT, WM


def _qf_forward(A, W, interpret):
    m, n = A.shape
    g = W.shape[0]
    tn, npad, gb, gpad = _qf_tiles(m, n, g, _QF_TILE_N)
    Ap = _qf_pad_cols(A, npad)
    WT, _ = _qf_flatten_w(W, gpad)
    S = _qf_selectors(gb, m, A.dtype)
    nt, gt = npad // tn, gpad // gb
    out = pl.pallas_call(
        _qf_fwd_body,
        grid=(nt, gt),
        in_specs=[
            pl.BlockSpec((gb * m, m), lambda j, gg: (gg, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tn), lambda j, gg: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, gb * m), lambda j, gg: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (gb, tn), lambda j, gg: (gg, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((gpad, npad), A.dtype),
        interpret=interpret,
    )(WT, Ap, S)
    return out[:g, :n], (A, W)


def _qf_fwd_rule(A, W, interpret):
    return _qf_forward(A, W, interpret)


def _qf_bwd_rule(interpret, res, vbar):
    A, W = res
    m, n = A.shape
    g = W.shape[0]
    # half the forward N tile: the backward keeps two (GB*M, TN) tiles live
    tn, npad, gb, gpad = _qf_tiles(m, n, g, _QF_TILE_N // 2)
    Ap = _qf_pad_cols(A, npad)
    WT, WM = _qf_flatten_w(W, gpad)
    vbp = _qf_pad_groups(_qf_pad_cols(vbar, npad), gpad)  # zero cotangents pad
    ST = _qf_selectors(gb, m, A.dtype).T
    nt, gt = npad // tn, gpad // gb

    dWT = pl.pallas_call(
        _qf_dwt_body,
        grid=(gt, nt),
        in_specs=[
            pl.BlockSpec((gb * m, m), lambda gg, j: (gg, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tn), lambda gg, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, m), lambda gg, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, tn), lambda gg, j: (gg, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb * m, gb), lambda gg, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (gb * m, m), lambda gg, j: (gg, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((gpad * m, m), A.dtype),
        interpret=interpret,
    )(WT, Ap, Ap.T, vbp, ST)
    # WT rows are (g, k): un-flatten to (g, k, m) then swap back to (g, m, k)
    dW = dWT.reshape(gpad, m, m).transpose(0, 2, 1)[:g]

    dA = pl.pallas_call(
        _qf_da_body,
        grid=(nt, gt),
        in_specs=[
            pl.BlockSpec((gb * m, m), lambda j, gg: (gg, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, gb * m), lambda j, gg: (0, gg), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tn), lambda j, gg: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, tn), lambda j, gg: (gg, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb * m, gb), lambda j, gg: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (m, tn), lambda j, gg: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, npad), A.dtype),
        interpret=interpret,
    )(WT, WM, Ap, vbp, ST)

    return dA[:, :n], dW


quadform_diag_pallas.defvjp(_qf_fwd_rule, _qf_bwd_rule)
