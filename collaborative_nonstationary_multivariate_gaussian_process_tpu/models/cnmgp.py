"""CNMGP: Collaborative Nonstationary Multivariate GP (sparse variational).

TPU-native re-design of the reference's `NMGP` torch module
(/root/reference/code/nmgp_dsvi.py:99-722).  Differences in *mechanism* (the
math is identical):

  - Parameters live in an immutable pytree (`CNMGPParams`); the negative
    stochastic ELBO is one pure jitted function of (params, data, rng).
  - The reference's D(D+1)/2 Python loop of `MGP_d` solves
    (nmgp_dsvi.py:227-237) collapses into two batched conditioning calls
    (diagonal group under the K_L1 kernel, off-diagonal group under K_L0),
    each a single MXU matmul + einsum.
  - Heterotopic data is a flat (x, y, output-index, weight) quadruple with
    static shapes; ragged per-output lists become a gather by index
    (replacing `vec2list` + `output_index` gathers, nmgp_dsvi.py:163-169).
  - Posterior predictive draws are one pure function vmapped over sample
    keys instead of a Python loop rebuilding every kernel per draw
    (nmgp_dsvi.py:406-580).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DSVI_JITTER
from ..ops.distributions import normal_logprob_sum
from ..ops.kernels import gibbs, rbf
from ..ops.linalg import (
    chol_tri_inv,
    conditional_projection,
    mgp_mean,
    mgp_mean_var_white,
    sample_diag,
    sample_full_cov,
    tri_solve_white,
    tril_mask,
    tril_regularized,
)

__all__ = [
    "CNMGPParams",
    "init_params",
    "negative_selbo",
    "elbo_estimate",
    "sample_y_once",
    "sample_fy_once",
    "predict_y_mean",
    "packed_U_indices",
    "pack_U",
    "unpack_U",
]


class CNMGPParams(NamedTuple):
    """Variational parameters + log hyperparameters.

    Mirrors the reference parameter set (nmgp_dsvi.py:117-155):
      mu_v/sqrt_v     — inducing posterior of the log-lengthscale process
      mu_W/sqrt_W     — inducing posterior of the D latent functions g_d
      mu_U/sqrt_U     — inducing posterior of the D(D+1)/2 coefficient
                        entries L_ij, PACKED offdiag-first (see
                        `packed_U_indices`; the reference stores a dense
                        (D, D, ...) table and masks the upper triangle,
                        which at ECoG scale doubles parameter/optimizer HBM
                        traffic and puts a gather+scatter-add pair on the
                        training step's hot path — the packed layout makes
                        the per-group slices free)
      *_log scalars   — exp-reparameterized hyperparameters
    """

    mu_v: jax.Array  # (M,)
    sqrt_v: jax.Array  # (M, M), lower triangle used
    mu_W: jax.Array  # (D, M)
    sqrt_W: jax.Array  # (D, M, M)
    mu_U: jax.Array  # (D(D+1)/2, M), offdiag entries first, then diag
    sqrt_U: jax.Array  # (D(D+1)/2, M, M), same packing
    sigma2_tildeell_log: jax.Array  # ()
    length_scales_tildeell_log: jax.Array  # ()
    sigma2_L0_log: jax.Array  # ()
    length_scales_L0_log: jax.Array  # ()
    sigma2_L1_log: jax.Array  # ()
    length_scales_L1_log: jax.Array  # ()
    sigma2_err_log: jax.Array  # ()

    @property
    def num_inducing(self) -> int:
        return self.mu_v.shape[-1]

    @property
    def num_outputs(self) -> int:
        return self.mu_W.shape[-2]


def init_params(
    key,
    dim_outputs: int,
    num_inducing: int,
    dtype=jnp.float32,
    mu_v=None,
    mu_W=None,
    mu_U=None,
    sqrt_v=None,
    sqrt_W=None,
    sqrt_U=None,
    sqrt_scale: float = 0.1,
) -> CNMGPParams:
    """Random initialization matching the reference's defaults
    (nmgp_dsvi.py:115-155): 0.1-scaled Gaussian means/sqrt factors,
    mu_v = -4, and hyper logs (0, -4, 0, -4, 0, -4, -2)."""
    D, M = dim_outputs, num_inducing
    ks = jax.random.split(key, 5)

    def _or(given, draw):
        return jnp.asarray(given, dtype) if given is not None else draw

    def _or_U(given, draw, packed_ndim):
        """Accept either the packed (G, ...) layout or a dense (D, D, ...)
        table (the reference's layout, what pre-estimation produces)."""
        if given is None:
            return draw
        a = jnp.asarray(given, dtype)
        if a.ndim == packed_ndim + 1:
            a = pack_U(a)
        return a

    G = D * (D + 1) // 2
    mu_W = _or(mu_W, 0.1 * jax.random.normal(ks[0], (D, M), dtype))
    sqrt_W = _or(sqrt_W, sqrt_scale * jax.random.normal(ks[1], (D, M, M), dtype))
    mu_v = _or(mu_v, -4.0 * jnp.ones((M,), dtype))
    sqrt_v = _or(sqrt_v, sqrt_scale * jax.random.normal(ks[2], (M, M), dtype))
    mu_U = _or_U(mu_U, 0.1 * jax.random.normal(ks[3], (G, M), dtype), 2)
    sqrt_U = _or_U(sqrt_U, sqrt_scale * jax.random.normal(ks[4], (G, M, M), dtype), 3)
    z = lambda v: jnp.asarray(v, dtype)
    return CNMGPParams(
        mu_v=mu_v,
        sqrt_v=sqrt_v,
        mu_W=mu_W,
        sqrt_W=sqrt_W,
        mu_U=mu_U,
        sqrt_U=sqrt_U,
        sigma2_tildeell_log=z(0.0),
        length_scales_tildeell_log=z(-4.0),
        sigma2_L0_log=z(0.0),
        length_scales_L0_log=z(-4.0),
        sigma2_L1_log=z(0.0),
        length_scales_L1_log=z(-4.0),
        sigma2_err_log=z(-2.0),
    )


def _offdiag_indices(D: int):
    """Static (row, col) index arrays of the strict lower triangle."""
    ii, jj = np.tril_indices(D, k=-1)
    return jnp.asarray(ii), jnp.asarray(jj)


def packed_U_indices(D: int):
    """(row, col) of each packed coefficient entry, as numpy arrays.

    Packing order: the D(D-1)/2 strict-lower-triangle entries in
    `np.tril_indices(D, -1)` order, then the D diagonal entries.  With this
    order the two kernel groups the ELBO needs — offdiag (stationary RBF
    K_L0) and diag (log-GP K_L1) — are contiguous SLICES `[:T0]` / `[T0:]`
    of the packed axis instead of gathers.
    """
    ii, jj = np.tril_indices(D, k=-1)
    rows = np.concatenate([ii, np.arange(D)])
    cols = np.concatenate([jj, np.arange(D)])
    return rows, cols


def pack_U(dense):
    """Dense (D, D, ...) coefficient table -> packed (D(D+1)/2, ...)."""
    D = dense.shape[0]
    rows, cols = packed_U_indices(D)
    return jnp.asarray(dense)[rows, cols]


def unpack_U(packed, D: int, fill=0.0):
    """Packed (D(D+1)/2, ...) -> dense (D, D, ...) lower-triangular table
    (upper triangle = `fill`); inverse of `pack_U` for analysis/IO."""
    rows, cols = packed_U_indices(D)
    out = jnp.full((D, D) + tuple(packed.shape[1:]), fill, packed.dtype)
    return out.at[rows, cols].set(packed)


class _Latents(NamedTuple):
    """Per-minibatch sampled/conditioned latent quantities.

    The prior factorizations are carried in *whitened* form: the batched
    Cholesky runs once (3 stationary kernels + the Gibbs kernel), its
    triangular inverse `Lp_inv` turns every later prior solve into an MXU
    matmul, and the whitened variational factors `Wh_* = Lp^{-1} Lq` are
    shared between the conditional variances and the KL trace terms — the
    reference re-factors the same matrices in `KL_Gaussian`
    (utils.py:344-348) and solves against them once per tri-entry
    (utils.py:118).  Prior order everywhere: [tildeell, L0, L1, G].
    """

    L_full: jax.Array  # (B, D, D) full sampled coefficient matrices
    mu_g: jax.Array  # (D, B)
    sigma2_g: jax.Array  # (D, B)
    tilde_ell: jax.Array  # (B,)
    sampled_v: jax.Array  # (M,)
    Lp_all: jax.Array  # (4, M, M) chol of (K22 + jI), [te, L0, L1, G]
    Lp_inv: jax.Array  # (4, M, M) triangular inverses of Lp_all
    Wh_v: jax.Array  # (M, M)      Lp_te^{-1} tril(sqrt_v)
    Wh_off: jax.Array  # (T0, M, M) Lp_L0^{-1} tril(sqrt_U)[offdiag]
    Wh_diag: jax.Array  # (D, M, M)  Lp_L1^{-1} tril(sqrt_U)[diag]
    Wh_W: jax.Array  # (D, M, M)  Lp_G^{-1} tril(sqrt_W)


def _sample_latents(
    params: CNMGPParams, Z, x, key, jitter=DSVI_JITTER, sigma2_g=1.0,
    robust=False, kl_mode="true",
) -> _Latents:
    """One reparameterized draw of all latent processes at the batch inputs.

    Follows `NMGP.forward`'s sampling phase (nmgp_dsvi.py:196-253):
      1. joint draw of (v, tilde_ell(x)) via sparse-GP conditional (JGP_S)
      2. draw of every L_ij(x) via marginalized conditionals (MGP_d),
         batched over the two kernel groups
      3. analytic marginal mean/var of the shared latents g_d (MGP_mu_sigma2)

    kl_mode "true" (default): variational factors go through
    `tril_regularized` — q is exactly N(mu, L̃ L̃ᵀ), matching the exact
    fast KL (ops/linalg.kl_gaussian_white).  "ref_compat": raw tril
    factors with the reference's Σ + jI full-cov sampling jitter
    (utils.py:40-64), for trajectory-exact reproduction.

    Caveat: the ±30 clamp on the log-lengthscale draws below (f32 overflow
    guard) applies in BOTH modes, and the reference has no clamp — so a
    ref_compat trajectory that ever exceeds |log ell| = 30 (i.e. one that
    is already diverging in f64 terms) stops being bit-exact there: the
    clip zeroes the gradient instead of overflowing.  Healthy trajectories
    never reach the clamp.
    """
    D = params.num_outputs
    dtype = x.dtype
    B = x.shape[0]

    s2_te = jnp.exp(params.sigma2_tildeell_log)
    ls_te = jnp.exp(params.length_scales_tildeell_log)
    s2_L0 = jnp.exp(params.sigma2_L0_log)
    ls_L0 = jnp.exp(params.length_scales_L0_log)
    s2_L1 = jnp.exp(params.sigma2_L1_log)
    ls_L1 = jnp.exp(params.length_scales_L1_log)

    k_v, k_te, k_diag, k_off = jax.random.split(key, 4)

    # One raw pairwise-distance computation feeds all three stationary
    # kernels (only the s2/ls scalings differ) — saves two matmul chains
    # per step vs building each RBF from scratch.
    from ..ops.kernels import sq_dist

    d2_xz = sq_dist(x, Z)  # (B, M)
    d2_zz = sq_dist(Z, Z)  # (M, M)

    def _rbf_pair(s2, ls):
        inv = 0.5 / (ls * ls)
        return s2 * jnp.exp(-d2_xz * inv), s2 * jnp.exp(-d2_zz * inv)

    # --- all four M x M priors: ONE batched factorization -----------------
    # (M x M Cholesky latency dominates the step; batching 4 costs the same
    # as 1 on the MXU pipeline, and the factors are reused by the KL terms.
    # The Gibbs gram K_G(Z,Z) only needs sampled_v — independent of the
    # stationary factors — so it joins the same batch.)
    K_te_12, K_te_22 = _rbf_pair(s2_te, ls_te)
    K_L0_12, K_L0_22 = _rbf_pair(s2_L0, ls_L0)
    K_L1_12, K_L1_22 = _rbf_pair(s2_L1, ls_L1)
    if kl_mode == "ref_compat":
        tril_fn = tril_mask
        Lt_v = tril_mask(params.sqrt_v)
        sampled_v = sample_full_cov(k_v, params.mu_v, Lt_v, jitter)
    else:
        tril_fn = partial(tril_regularized, jitter=jitter)
        Lt_v = tril_fn(params.sqrt_v)
        sampled_v = sample_full_cov(k_v, params.mu_v, Lt_v, 0.0)
    # f32 overflow guard: exp(|x| > 88) is inf, and an overflowed ell turns
    # the Gibbs gram into garbage that the nonfinite-grad mask can't fully
    # contain (observed: HCP run divergent after ~30 epochs at lr 0.01).
    # |log ell| <= 30 is vastly beyond any meaningful lengthscale, so the
    # clamp is semantics-free in the fitted region while keeping every
    # downstream kernel entry finite.
    sampled_v = jnp.clip(sampled_v, -30.0, 30.0)
    ell_Z = jnp.exp(sampled_v)
    K_G_22 = gibbs(Z, Z, ell_Z, ell_Z, sigma2_g).astype(dtype)
    M = Z.shape[0]
    eyeM = jnp.eye(M, dtype=dtype)
    # Whitened conditioning: ONE batched Cholesky + triangular inverse of
    # the four prior factors (fused custom-VJP op: backward is matmul-only)
    # plus ONE batched forward substitution for the cross grams; every
    # remaining prior contraction (means, variances, KL traces/Mahalanobis)
    # is then an MXU matmul.  The ill-conditioned direction — K12 against
    # the prior — still goes through the backward-stable substitution
    # (A below), NOT through an explicit K22^{-1} (which overflows the
    # conditional moments in f32 at the drivers' extreme init
    # lengthscales); Lp_inv itself only ever appears inside sums of
    # squares and M-vector projections.
    K_stack = jnp.stack([K_te_22, K_L0_22, K_L1_22, K_G_22]) + jitter * eyeM
    if robust:
        # predictive draws only: rescue the rare draw whose sampled ell(Z)
        # makes a prior gram f32-rank-deficient (see chol_tri_inv_robust)
        from ..ops.linalg import chol_tri_inv_robust

        Lp_all, Lp_inv = chol_tri_inv_robust(K_stack, jitter)
    else:
        Lp_all, Lp_inv = chol_tri_inv(K_stack)
    K12s = jnp.stack([K_te_12, K_L0_12, K_L1_12])  # (3, B, M)
    A_stat = tri_solve_white(
        Lp_all[:3], Lp_inv[:3], K12s.transpose(0, 2, 1)
    )  # (3, M, B): A = Lp^{-1} K12ᵀ
    A_te, A_L0, A_L1 = A_stat[0], A_stat[1], A_stat[2]

    # --- (v, tilde_ell) joint draw (v drawn above, before the batch) -----
    mu_te = A_te.T @ (Lp_inv[0] @ sampled_v)
    # clamp the Nystrom residual: float32 cancellation can exceed the
    # reparameterize jitter at large M (see ops/linalg.mgp_mean_var)
    var_te = jnp.maximum(s2_te - jnp.sum(A_te * A_te, axis=0), 0.0)
    tilde_ell = jnp.clip(sample_diag(k_te, mu_te, var_te, jitter), -30.0, 30.0)
    ell_X = jnp.exp(tilde_ell)
    Wh_v = Lp_inv[0] @ Lt_v

    # --- coefficient matrix L(x) ----------------------------------------
    # mgp_mean_var_white consumes the variational factors directly — no
    # Sigma = L Lᵀ grams, nonnegative q-variance by construction, and the
    # whitened factors Wh feed the KL for free.

    # packed layout: [:T0] = offdiag entries (K_L0 group), [T0:] = diag
    # entries (K_L1 log-GP group) — contiguous slices, no gathers, and the
    # parameter/Adam HBM traffic is half the dense (D, D, M, M) table's
    T0 = D * (D - 1) // 2
    Sigma_U_tril = tril_fn(params.sqrt_U)  # (G, M, M)

    dd = jnp.arange(D)
    mu_diag = params.mu_U[T0:]  # (D, M)
    d11_1 = jnp.full((B,), s2_L1, dtype)
    mean_d, var_d, Wh_diag = mgp_mean_var_white(
        A_L1, Lp_inv[2], d11_1, mu_diag, Sigma_U_tril[T0:]
    )
    log_L_diag = sample_diag(k_diag, mean_d, var_d, jitter)  # (D, B)
    L_diag = jnp.exp(log_L_diag)

    L_full = jnp.zeros((B, D, D), dtype)
    if D > 1:
        ii, jj = _offdiag_indices(D)
        mu_off = params.mu_U[:T0]  # (T0, M)
        d11_0 = jnp.full((B,), s2_L0, dtype)
        mean_o, var_o, Wh_off = mgp_mean_var_white(
            A_L0, Lp_inv[1], d11_0, mu_off, Sigma_U_tril[:T0]
        )
        L_off = sample_diag(k_off, mean_o, var_o, jitter)  # (T0, B)
        L_full = L_full.at[:, ii, jj].set(L_off.T)
    else:
        Wh_off = jnp.zeros((0, M, M), dtype)
    L_full = L_full.at[:, dd, dd].set(L_diag.T)

    # --- shared latents g (analytic marginal stats) ---------------------
    K_G_12 = gibbs(x, Z, ell_X, ell_Z, sigma2_g)
    A_G = tri_solve_white(Lp_all[3], Lp_inv[3], K_G_12.T)
    d11_g = jnp.full((B,), sigma2_g, dtype)
    mu_g, s2_g, Wh_W = mgp_mean_var_white(
        A_G, Lp_inv[3], d11_g, params.mu_W, tril_fn(params.sqrt_W)
    )

    return _Latents(
        L_full=L_full,
        mu_g=mu_g,
        sigma2_g=s2_g,
        tilde_ell=tilde_ell,
        sampled_v=sampled_v,
        Lp_all=Lp_all,
        Lp_inv=Lp_inv,
        Wh_v=Wh_v,
        Wh_off=Wh_off,
        Wh_diag=Wh_diag,
        Wh_W=Wh_W,
    )


def _kl_terms(params: CNMGPParams, lat: _Latents, jitter=DSVI_JITTER, kl_mode="true"):
    """The three KL groups (nmgp_dsvi.py:266-295).

    Everything expensive is already computed by `_sample_latents`: the
    whitened variational factors Wh = Lp^{-1} Lq carry the trace terms, the
    batched triangular inverse carries the Mahalanobis projections, and the
    prior logdets read off the Cholesky diagonals — the reference re-factors
    and re-solves all of it inside `KL_Gaussian` (utils.py:332-351).  The
    q-side uses the fast diag-based logdet (see ops/linalg.kl_gaussian_chol)
    — at D=78 a batched re-Cholesky of the D^2 variational covariances would
    dominate the training step.

    kl_mode: "true" (default) — the EXACT Gaussian KL for the regularized
    factor family q = N(mu, L̃ L̃ᵀ), L̃ = tril_regularized(sqrt):
    logdet_q is the plain diag product (no batched q-side Cholesky) and the
    trace rides the whitened factors already computed for the conditional
    variances.  "ref_compat" — the reference's KL as it actually computes
    on raw tril factors with jitter on both sides, including its diag-only
    trace term from old torch's triangular_solve upper=True default (see
    ops/linalg.kl_gaussian_ref_compat); use it to reproduce the reference's
    published optimization trajectory exactly.  The factors in `lat` were
    built under the same mode by `_sample_latents`, so the whitened Wh_*
    match the q-family the KL assumes.
    """
    from ..ops.linalg import (
        kl_gaussian_ref_compat,
        kl_gaussian_white,
        regularized_diag,
    )

    D = params.num_outputs

    # per-prior scalars, order [te, L0, L1, G]
    Lp_diag = jnp.diagonal(lat.Lp_all, axis1=-2, axis2=-1)
    logdet_p = jnp.sum(jnp.log(Lp_diag), axis=-1)

    if kl_mode == "ref_compat":
        # reference semantics need the full raw tril (exact chol of Σq + jI)
        def qfac(X):
            return tril_mask(X)

        def kl(mu_q, lq, _wh, ld_p, lp_inv, lp_d):
            return kl_gaussian_ref_compat(mu_q, lq, lp_d, ld_p, lp_inv, jitter)
    else:
        # exact fast KL needs only the regularized diag — O(M) per factor,
        # no (G, M, M) re-materialization on the ECoG-scale hot path
        def qfac(X):
            return regularized_diag(X, jitter)

        def kl(mu_q, dq, wh, ld_p, lp_inv, _lp_d):
            return kl_gaussian_white(mu_q, dq, wh, ld_p, lp_inv)

    kl_W = jnp.sum(
        kl(params.mu_W, qfac(params.sqrt_W), lat.Wh_W, logdet_p[3], lat.Lp_inv[3], Lp_diag[3])
    )
    kl_v = kl(
        params.mu_v, qfac(params.sqrt_v), lat.Wh_v, logdet_p[0], lat.Lp_inv[0], Lp_diag[0]
    )

    T0 = D * (D - 1) // 2
    sqrt_U_q = qfac(params.sqrt_U)
    kl_U = jnp.sum(
        kl(params.mu_U[T0:], sqrt_U_q[T0:], lat.Wh_diag, logdet_p[2], lat.Lp_inv[2], Lp_diag[2])
    )
    if D > 1:
        kl_U = kl_U + jnp.sum(
            kl(params.mu_U[:T0], sqrt_U_q[:T0], lat.Wh_off, logdet_p[1], lat.Lp_inv[1], Lp_diag[1])
        )
    return kl_W, kl_v, kl_U


def _reconstruction(params: CNMGPParams, lat: _Latents, y, idx, weight):
    """Weighted reconstruction term (nmgp_dsvi.py:255-258).

    `weight` is a 0/1 mask enabling padded (static-shape) final batches.
    """
    # one-hot contraction instead of a dynamic row gather: the (B,)-indexed
    # gather lowers to a slow scatter/gather path on TPU, the einsum is MXU
    onehot = jax.nn.one_hot(idx, lat.L_full.shape[-1], dtype=y.dtype)
    sampled_l = jnp.einsum("bij,bi->bj", lat.L_full, onehot)  # (B, D)
    s2_err = jnp.exp(params.sigma2_err_log)
    F = jnp.sum(sampled_l * lat.mu_g.T, axis=1)

    var = s2_err
    log_pdf = (
        -((y - F) ** 2) / (2.0 * var)
        - 0.5 * params.sigma2_err_log
        - 0.5 * jnp.log(2.0 * jnp.pi)
    )
    recon = jnp.sum(log_pdf * weight)
    correction = (
        0.5 / s2_err * jnp.sum((sampled_l**2) * lat.sigma2_g.T * weight[:, None])
    )
    return recon - correction


def negative_selbo(
    params: CNMGPParams,
    Z,
    x,
    y,
    idx,
    weight,
    n_total,
    key,
    jitter=DSVI_JITTER,
    kl_mode="true",
):
    """-SELBO for one minibatch (the reference's `NMGP.forward`,
    nmgp_dsvi.py:157-301).

    x: (B,) or (B, d) inputs; y: (B,); idx: (B,) int output index;
    weight: (B,) 0/1 mask (padding); n_total: total observation count N.
    kl_mode: see `_kl_terms`.
    """
    lat = _sample_latents(params, Z, x, key, jitter, kl_mode=kl_mode)
    batch_size = jnp.sum(weight)
    recon = _reconstruction(params, lat, y, idx, weight)
    kl_W, kl_v, kl_U = _kl_terms(params, lat, jitter, kl_mode)
    selbo = n_total / batch_size * recon - kl_W - kl_v - kl_U
    return -selbo


def elbo_estimate(
    params: CNMGPParams,
    Z,
    x,
    y,
    idx,
    key,
    n_sample: int = 100,
    jitter=DSVI_JITTER,
    kl_mode="true",
):
    """Monte-Carlo ELBO over the full data (reference `compute_ELBO`,
    nmgp_dsvi.py:303-404) — one jitted vmap over sample keys."""
    weight = jnp.ones_like(y)

    def one(k):
        lat = _sample_latents(params, Z, x, k, jitter, kl_mode=kl_mode)
        recon = _reconstruction(params, lat, y, idx, weight)
        kls = _kl_terms(params, lat, jitter, kl_mode)
        return recon, sum(kls)

    recons, kls = jax.vmap(one)(jax.random.split(key, n_sample))
    return jnp.mean(recons) - jnp.mean(kls)


# ---------------------------------------------------------------------------
# Posterior predictive
# ---------------------------------------------------------------------------


def sample_y_once(params: CNMGPParams, Z, x, idx, key, jitter=DSVI_JITTER,
                  kl_mode="true"):
    """One posterior-predictive draw at flat inputs x with output rows idx.

    Mirrors one iteration of `NMGP.sample_Y` (nmgp_dsvi.py:435-486): here g is
    *drawn* (not analytically marginalized).  Returns
    (y_star (B,), l_star (B, D), g_star (D, B), tilde_ell (B,)).
    Use jax.vmap over keys for S draws.  `kl_mode` selects the variational
    factor family to match how the model was trained (see `_sample_latents`).
    """
    k_lat, k_g, k_y = jax.random.split(key, 3)
    lat = _sample_latents(params, Z, x, k_lat, jitter, robust=True, kl_mode=kl_mode)
    # draw g from its marginal
    g_star = sample_diag(k_g, lat.mu_g, lat.sigma2_g, jitter)  # (D, B)
    onehot = jax.nn.one_hot(idx, params.num_outputs, dtype=x.dtype)
    l_star = jnp.einsum("bij,bi->bj", lat.L_full, onehot)  # (B, D)
    F = jnp.sum(l_star * g_star.T, axis=1)
    s2_err = jnp.exp(params.sigma2_err_log)
    y_star = sample_diag(k_y, F, jnp.full_like(F, s2_err), jitter)
    return y_star, l_star, g_star, lat.tilde_ell


def sample_fy_once(params: CNMGPParams, Z, x, key, jitter=DSVI_JITTER,
                   kl_mode="true"):
    """One draw of (tilde_ell, Y(B,D), corr(B,D,D)) at common inputs x.

    Mirrors one iteration of `NMGP.sample_FY` (nmgp_dsvi.py:516-575): all D
    outputs at every input plus the implied per-point correlation matrix
    corr = Dg^{-1} L Lᵀ Dg^{-1}.
    """
    k_lat, k_g, k_y = jax.random.split(key, 3)
    lat = _sample_latents(params, Z, x, k_lat, jitter, robust=True, kl_mode=kl_mode)
    g_star = sample_diag(k_g, lat.mu_g, lat.sigma2_g, jitter)  # (D, B)
    F = jnp.einsum("bij,jb->bi", lat.L_full, g_star)  # (B, D)
    s2_err = jnp.exp(params.sigma2_err_log)
    Y = sample_diag(k_y, F, jnp.full_like(F, s2_err), jitter)
    cov = jnp.einsum("bij,bkj->bik", lat.L_full, lat.L_full)
    inv_std = 1.0 / jnp.sqrt(jnp.diagonal(cov, axis1=-2, axis2=-1))
    corr = cov * inv_std[:, :, None] * inv_std[:, None, :]
    return lat.tilde_ell, Y, corr


def predict_y_mean(params: CNMGPParams, Z, x, idx, jitter=DSVI_JITTER, sigma2_g=1.0):
    """Plug-in posterior-mean prediction (reference `predict_Y`,
    nmgp_dsvi.py:666-722): all latents at their posterior means."""
    D = params.num_outputs
    dtype = x.dtype
    B = x.shape[0]
    s2_te = jnp.exp(params.sigma2_tildeell_log)
    ls_te = jnp.exp(params.length_scales_tildeell_log)
    s2_L0 = jnp.exp(params.sigma2_L0_log)
    ls_L0 = jnp.exp(params.length_scales_L0_log)
    s2_L1 = jnp.exp(params.sigma2_L1_log)
    ls_L1 = jnp.exp(params.length_scales_L1_log)

    K_te_12 = rbf(x, Z, s2_te, ls_te)
    K_te_22 = rbf(Z, Z, s2_te, ls_te)
    P_te = conditional_projection(K_te_12, K_te_22, jitter)
    est_tilde_ell = mgp_mean(P_te, params.mu_v)
    ell_Z = jnp.exp(params.mu_v)
    ell_X = jnp.exp(est_tilde_ell)

    P0 = conditional_projection(rbf(x, Z, s2_L0, ls_L0), rbf(Z, Z, s2_L0, ls_L0), jitter)
    P1 = conditional_projection(rbf(x, Z, s2_L1, ls_L1), rbf(Z, Z, s2_L1, ls_L1), jitter)
    dd = jnp.arange(D)
    T0 = D * (D - 1) // 2
    L_diag = jnp.exp(mgp_mean(P1, params.mu_U[T0:]))  # (D, B)
    L_full = jnp.zeros((B, D, D), dtype).at[:, dd, dd].set(L_diag.T)
    if D > 1:
        ii, jj = _offdiag_indices(D)
        L_off = mgp_mean(P0, params.mu_U[:T0])  # (T0, B)
        L_full = L_full.at[:, ii, jj].set(L_off.T)

    K_G_12 = gibbs(x, Z, ell_X, ell_Z, sigma2_g)
    K_G_22 = gibbs(Z, Z, ell_Z, ell_Z, sigma2_g)
    P_G = conditional_projection(K_G_12, K_G_22, jitter)
    est_g = mgp_mean(P_G, params.mu_W)  # (D, B)
    est_Y = jnp.einsum("bij,jb->bi", L_full, est_g)  # (B, D)
    return est_Y[jnp.arange(B), idx]
