"""Fully-Bayesian log-posterior library (sampler-agnostic densities).

TPU-native re-design of the reference's `SIM_code/Utility/logpos.py`: each
model variant exposes the same flat parameter-vector layout (`vec2pars*`
semantics, logpos.py:17-71) and a pure, jit/grad-ready
``log_posterior(pars, ...)`` suitable for NUTS/HMC/SMC drivers.

Variants (table in SURVEY.md §0.1):
  SNMGP      separable nonstationary:  B_f ⊗ K_x + σ² I   (logpos.py:216-296)
  GNMGP/SVC  varying covariance:  (1 ⊗ K_x) ∘ K_i, K_i=LLᵀ (logpos.py:299-380)
  LMC (S)    stationary:  scalar (l, σ)                    (logpos.py:383-462)
  Hadamard heterotopic versions of each                    (logpos.py:465-716)

Mechanism changes vs the reference:
  - the NaN-retry loop around the Kronecker log-pdf (logpos.py:267-268)
    becomes a deterministic `lax.cond` jitter fallback;
  - the SVC NM x NM covariance assembly is a single einsum instead of
    Python list-of-lists concatenation (logpos.py:111-137);
  - all densities are closed over static shapes so `vmap` gives
    chain-parallel evaluation for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MCMC_JITTER, PRECISION
from ..ops.distributions import (
    inverse_gamma_logpdf,
    inverse_gamma_logpdf_u,
    mvn_logpdf_chol,
    mvn_logpdf_dense,
    mvn_logpdf_kron,
)
from ..ops.kernels import nonstationary_rbf, rbf
from ..ops.linalg import uvec_to_lvec, vec_to_tril

__all__ = [
    "tri_size",
    "SNMGPPars",
    "SVCPars",
    "LMCPars",
    "snmgp_unflatten",
    "svc_unflatten",
    "lmc_unflatten",
    "snmgp_log_posterior",
    "svc_log_posterior",
    "lmc_log_posterior",
    "snmgp_hadamard_log_posterior",
    "svc_hadamard_log_posterior",
    "lmc_hadamard_log_posterior",
    "snmgp_deviance",
    "lmc_deviance",
    "svc_deviance",
    "snmgp_covs",
    "snmgp_hadamard_covs",
    "make_nlp",
    "DEFAULT_HYPERS",
    "SVC_DEFAULT_HYPERS",
]

DEFAULT_HYPERS = dict(
    mu_tilde_l=0.0,
    alpha_tilde_l=1.0,
    beta_tilde_l=1.0,
    mu_tilde_sigma=0.0,
    alpha_tilde_sigma=1.0,
    beta_tilde_sigma=1.0,
    a=1.0,
    b=1.0,
    c=10.0,
)  # (logpos.py:14)

SVC_DEFAULT_HYPERS = dict(
    mu_tilde_l=0.0,
    alpha_tilde_l=5.0,
    beta_tilde_l=1.0,
    mu_L=0.0,
    alpha_L=5.0,
    beta_L=1.0,
    a=1.0,
    b=1.0,
)  # (logpos.py:299)


def tri_size(m: int) -> int:
    return m * (m + 1) // 2


# ---------------------------------------------------------------------------
# Flat-vector layouts (vec2pars* semantics)
# ---------------------------------------------------------------------------


class SNMGPPars(NamedTuple):
    tilde_l: jax.Array  # (N,)
    tilde_sigma: jax.Array  # (N,)
    uL_vec: jax.Array  # (T,)
    tilde_sigma2_err: jax.Array  # ()


class SVCPars(NamedTuple):
    tilde_l: jax.Array  # (N,)
    uL_vecs: jax.Array  # (N*T,)
    tilde_sigma2_err: jax.Array  # ()


class LMCPars(NamedTuple):
    tilde_l: jax.Array  # ()
    tilde_sigma: jax.Array  # ()
    uL_vec: jax.Array  # (T,)
    tilde_sigma2_err: jax.Array  # ()


def snmgp_unflatten(pars, N: int, M: int) -> SNMGPPars:
    """`vec2pars` (logpos.py:17-29)."""
    T = tri_size(M)
    return SNMGPPars(pars[:N], pars[N : 2 * N], pars[2 * N : 2 * N + T], pars[-1])


def snmgp_flatten(p: SNMGPPars):
    return jnp.concatenate(
        [p.tilde_l, p.tilde_sigma, p.uL_vec, jnp.reshape(p.tilde_sigma2_err, (1,))]
    )


def svc_unflatten(pars, N: int, M: int) -> SVCPars:
    """`vec2pars_SVC` (logpos.py:32-43)."""
    T = tri_size(M)
    return SVCPars(pars[:N], pars[N : N + N * T], pars[-1])


def svc_flatten(p: SVCPars):
    return jnp.concatenate([p.tilde_l, p.uL_vecs, jnp.reshape(p.tilde_sigma2_err, (1,))])


def lmc_unflatten(pars, M: int) -> LMCPars:
    """`vec2pars_S` (logpos.py:46-57)."""
    T = tri_size(M)
    return LMCPars(pars[0], pars[1], pars[2 : 2 + T], pars[-1])


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


def _kron_loglik_robust(y, B_f, K_x, sigma2_err, jitter=PRECISION):
    """Kronecker MVN log-lik with an always-on deterministic factor jitter.

    Replaces the reference's `while loglik != loglik:` random-retry loop
    (logpos.py:267-268).  A `lax.cond` NaN-fallback would be closest in
    spirit, but cond's batching rule breaks under vmap-inside-shard_map
    (chain-parallel NUTS); the tiny symmetric jitter on both Kronecker
    factors is branchless, costs nothing extra, and regularizes the
    eigendecompositions the same way the reference's retry did.

    Float64 needs no crutch (the reference's retry virtually never fires
    there) — the jitter is applied only in float32.
    """
    zero = jnp.zeros_like(y)
    if jnp.finfo(y.dtype).eps > 1e-10:  # static dtype check: f32/bf16 only
        return mvn_logpdf_kron(y, zero, B_f, K_x, sigma2_err, jitter=jitter)
    return mvn_logpdf_kron(y, zero, B_f, K_x, sigma2_err)


def _prior_jitter(dtype, alpha=1.0):
    """Diagonal jitter for prior-covariance Choleskys, scaled to the signal
    variance and the dtype's precision.

    The reference runs float64 with absolute jitter 1e-6 (settings.py:3);
    in float32 a smooth RBF prior (e.g. alpha=3, beta=0.4 over [0,1]) is
    numerically singular at that jitter and the Cholesky NaNs — use a
    relative floor ~400x machine epsilon instead.
    """
    eps = jnp.finfo(dtype).eps
    rel = jnp.maximum(jnp.asarray(MCMC_JITTER, dtype), 400.0 * eps)
    return rel * jnp.asarray(alpha, dtype) ** 2


def _gp_prior(vals, x, mu, alpha, beta, jitter=None):
    """Normalized MVN GP prior with RBF covariance (logpos.py:271-279).

    The reference's `RBF_cov` adds `settings.jitter` on the diagonal when
    called with one argument (kernels.py:35); replicated here with a
    dtype-aware jitter (see `_prior_jitter`).
    """
    if jitter is None:
        jitter = _prior_jitter(x.dtype, alpha)
    S = rbf(x, x, alpha**2, beta) + jitter * jnp.eye(x.shape[0], dtype=x.dtype)
    return mvn_logpdf_chol(vals, mu * jnp.ones_like(vals), S)


def _normal_logpdf(v, mu, sigma):
    return -0.5 * ((v - mu) / sigma) ** 2 - jnp.log(sigma) - 0.5 * jnp.log(2 * jnp.pi)


def _Lf_stack(uL_vecs, N: int, M: int):
    """(N*T,) unconstrained -> (N, M, M) per-point lower-Cholesky stack.

    Replaces `uLvecs2Lvecs` + python list of `vec2lowtriangle`
    (logpos.py:339-341) with batched ops.
    """
    T = tri_size(M)
    u = uL_vecs.reshape(N, T)
    lvecs = uvec_to_lvec(u, M)  # vectorized over leading axis
    return vec_to_tril(lvecs, M)  # (N, M, M)


def svc_covariance(tilde_l, uL_vecs, x, jitter=MCMC_JITTER):
    """Task-major (MN x MN) SVC covariance K = (1 ⊗ K_x) ∘ K_i.

    K[(i,n),(j,m)] = K_x[n,m] * <L_f[n,i,:], L_f[m,j,:]>
    One einsum replaces generate_K_index_SVC + reorder (logpos.py:346-349).
    """
    N = x.shape[0]
    M_dim = int(np.sqrt(uL_vecs.shape[0] // N * 2 + 0.25) - 0.5)  # T=M(M+1)/2
    L_f = _Lf_stack(uL_vecs, N, M_dim)
    l = jnp.exp(tilde_l)
    K_x = nonstationary_rbf(x, ell1=l) + jitter * jnp.eye(N, dtype=x.dtype)
    K = jnp.einsum("nm,nia,mja->injm", K_x, L_f, L_f)
    return K.reshape(M_dim * N, M_dim * N), L_f


# ---------------------------------------------------------------------------
# SNMGP (separable nonstationary)
# ---------------------------------------------------------------------------


def snmgp_log_posterior(
    pars,
    Y,
    x,
    mu_tilde_l=0.0,
    alpha_tilde_l=1.0,
    beta_tilde_l=1.0,
    mu_tilde_sigma=0.0,
    alpha_tilde_sigma=1.0,
    beta_tilde_sigma=1.0,
    a=1.0,
    b=1.0,
    c=10.0,
    prior=True,
):
    """log p(pars | Y, x) for the SNMGP (reference `logpos`,
    logpos.py:237-296).  Y: (N, M); x: (N,); pars: flat layout above."""
    N, M = Y.shape
    p = snmgp_unflatten(pars, N, M)
    y = Y.T.reshape(-1)  # task-major, like Y.t().contiguous().view(-1)
    L = vec_to_tril(uvec_to_lvec(p.uL_vec, M), M)
    B_f = L @ L.T
    l = jnp.exp(p.tilde_l)
    sigma = jnp.exp(p.tilde_sigma)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    K_x = nonstationary_rbf(x, sigma1=sigma, ell1=l) + MCMC_JITTER * jnp.eye(
        N, dtype=x.dtype
    )
    res = _kron_loglik_robust(y, B_f, K_x, sigma2_err)
    if prior:
        res = res + _gp_prior(p.tilde_l, x, mu_tilde_l, alpha_tilde_l, beta_tilde_l)
        res = res + _gp_prior(
            p.tilde_sigma, x, mu_tilde_sigma, alpha_tilde_sigma, beta_tilde_sigma
        )
        res = res + jnp.sum(_normal_logpdf(p.uL_vec, 0.0, c))
        res = res + inverse_gamma_logpdf(sigma2_err, alpha=a, beta=b)
        res = res + p.tilde_sigma2_err  # log-Jacobian of the exp transform
    return res


def snmgp_deviance(pars, Y, x):
    """-2 loglik (reference `deviance`, logpos.py:189-213). Uses the
    *constrained* L_vec layout like the reference deviance (no exp on diag)."""
    N, M = Y.shape
    p = snmgp_unflatten(pars, N, M)
    y = Y.T.reshape(-1)
    L = vec_to_tril(p.uL_vec, M)
    B_f = L @ L.T
    K_x = nonstationary_rbf(x, sigma1=jnp.exp(p.tilde_sigma), ell1=jnp.exp(p.tilde_l))
    K_x = K_x + MCMC_JITTER * jnp.eye(N, dtype=x.dtype)
    ll = mvn_logpdf_kron(y, jnp.zeros_like(y), B_f, K_x, jnp.exp(p.tilde_sigma2_err))
    return -2.0 * ll


def lmc_deviance(pars, Y, x):
    """-2 loglik for the stationary LMC (constrained L_vec layout, like the
    reference deviance family, logpos.py:176-213)."""
    N, M = Y.shape
    p = lmc_unflatten(pars, M)
    y = Y.T.reshape(-1)
    L = vec_to_tril(p.uL_vec, M)
    B_f = L @ L.T
    l = jnp.exp(p.tilde_l) * jnp.ones(N, dtype=x.dtype)
    sigma = jnp.exp(p.tilde_sigma) * jnp.ones(N, dtype=x.dtype)
    K_x = nonstationary_rbf(x, sigma1=sigma, ell1=l) + MCMC_JITTER * jnp.eye(
        N, dtype=x.dtype
    )
    ll = mvn_logpdf_kron(y, jnp.zeros_like(y), B_f, K_x, jnp.exp(p.tilde_sigma2_err))
    return -2.0 * ll


def svc_deviance(pars, Y, x):
    """-2 loglik for the SVC model (constrained L_vecs layout)."""
    N, M = Y.shape
    T = tri_size(M)
    p = svc_unflatten(pars, N, M)
    y = Y.T.reshape(-1)
    L_f = vec_to_tril(p.uL_vecs.reshape(N, T), M)
    l = jnp.exp(p.tilde_l)
    K_x = nonstationary_rbf(x, ell1=l) + MCMC_JITTER * jnp.eye(N, dtype=x.dtype)
    K = jnp.einsum("nm,nia,mja->injm", K_x, L_f, L_f).reshape(M * N, M * N)
    S = K + jnp.exp(p.tilde_sigma2_err) * jnp.eye(N * M, dtype=x.dtype)
    return -2.0 * mvn_logpdf_dense(y, jnp.zeros_like(y), S)


def snmgp_covs(pars, Y, x, verbose: bool = False):
    """Assembled covariance components for debugging (reference `show_covs`,
    logpos.py:140-158): returns dict(B_f, K_x, sigma2_err).

    Like the reference, the L_vec block is used *raw* (no exp-diagonal) —
    this mirrors its behavior exactly, so feed it constrained vectors.
    """
    N, M = Y.shape
    p = snmgp_unflatten(pars, N, M)
    L = vec_to_tril(p.uL_vec, M)
    B_f = L @ L.T
    K_x = nonstationary_rbf(x, sigma1=jnp.exp(p.tilde_sigma), ell1=jnp.exp(p.tilde_l))
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    if verbose:
        print(f"B_f: {B_f}")
        print(f"K_x: {K_x}")
        print(f"sigma2_err: {sigma2_err}")
    return {"B_f": B_f, "K_x": K_x, "sigma2_err": sigma2_err}


def snmgp_hadamard_covs(pars, x, indx, verbose: bool = False):
    """Heterotopic variant (reference `show_covs_hadamard`, logpos.py:160-173):
    returns dict(B_f, sigma2_err).  `indx` gives the task count."""
    import numpy as _np

    N = x.shape[0]
    M = int(_np.unique(_np.asarray(indx)).shape[0])
    p = snmgp_unflatten(pars, N, M)
    L = vec_to_tril(p.uL_vec, M)
    B_f = L @ L.T
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    if verbose:
        print(f"B_f: {B_f}")
        print(f"sigma2_err: {sigma2_err}")
    return {"B_f": B_f, "sigma2_err": sigma2_err}


# ---------------------------------------------------------------------------
# GNMGP / SVC (spatially varying covariance)
# ---------------------------------------------------------------------------


def svc_log_posterior(
    pars,
    Y,
    x,
    mu_tilde_l=0.0,
    alpha_tilde_l=5.0,
    beta_tilde_l=1.0,
    mu_L=0.0,
    alpha_L=5.0,
    beta_L=1.0,
    a=1.0,
    b=1.0,
    prior=True,
):
    """log p(pars | Y, x) for the SVC model (reference `logpos_SVC`,
    logpos.py:326-380)."""
    N, M = Y.shape
    T = tri_size(M)
    p = svc_unflatten(pars, N, M)
    y = Y.T.reshape(-1)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    K, _ = svc_covariance(p.tilde_l, p.uL_vecs, x)
    S = K + sigma2_err * jnp.eye(N * M, dtype=x.dtype)
    res = mvn_logpdf_dense(y, jnp.zeros_like(y), S)
    if prior:
        res = res + _gp_prior(p.tilde_l, x, mu_tilde_l, alpha_tilde_l, beta_tilde_l)
        # GP prior over each of the T unconstrained Cholesky-entry processes
        U = p.uL_vecs.reshape(N, T)
        Sigma_L = rbf(x, x, alpha_L**2, beta_L) + _prior_jitter(x.dtype, alpha_L) * jnp.eye(
            N, dtype=x.dtype
        )
        chol = jnp.linalg.cholesky(Sigma_L)
        diff = U - mu_L  # (N, T)
        sol = jax.scipy.linalg.solve_triangular(chol, diff, lower=True)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        res = res + jnp.sum(
            -0.5 * jnp.sum(sol**2, axis=0) - 0.5 * logdet - 0.5 * N * jnp.log(2 * jnp.pi)
        )
        res = res + inverse_gamma_logpdf(sigma2_err, alpha=a, beta=b)
        res = res + p.tilde_sigma2_err
    return res


# ---------------------------------------------------------------------------
# LMC / stationary
# ---------------------------------------------------------------------------


def lmc_log_posterior(
    pars,
    Y,
    x,
    mu_tilde_l=0.0,
    sigma_tilde_l=1.0,
    a=1.0,
    b=1.0,
    c=10.0,
    prior=True,
):
    """log p(pars | Y, x) for the stationary LMC (reference `logpos_S`,
    logpos.py:405-462): scalar (tilde_l, tilde_sigma) broadcast over inputs."""
    N, M = Y.shape
    p = lmc_unflatten(pars, M)
    y = Y.T.reshape(-1)
    L = vec_to_tril(uvec_to_lvec(p.uL_vec, M), M)
    B_f = L @ L.T
    l = jnp.exp(p.tilde_l) * jnp.ones(N, dtype=x.dtype)
    sigma = jnp.exp(p.tilde_sigma) * jnp.ones(N, dtype=x.dtype)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    K_x = nonstationary_rbf(x, sigma1=sigma, ell1=l) + MCMC_JITTER * jnp.eye(
        N, dtype=x.dtype
    )
    res = _kron_loglik_robust(y, B_f, K_x, sigma2_err)
    if prior:
        res = res + _normal_logpdf(p.tilde_l, mu_tilde_l, sigma_tilde_l)
        res = res + jnp.sum(_normal_logpdf(p.uL_vec, 0.0, c))
        res = res + inverse_gamma_logpdf(sigma2_err, alpha=a, beta=b)
        res = res + p.tilde_sigma2_err
    return res


# ---------------------------------------------------------------------------
# Hadamard (heterotopic) variants: flat (x, indx, y)
# ---------------------------------------------------------------------------


def snmgp_hadamard_log_posterior(
    pars,
    x,
    indx,
    y,
    num_tasks: int,
    mu_tilde_l=0.0,
    alpha_tilde_l=1.0,
    beta_tilde_l=1.0,
    mu_tilde_sigma=0.0,
    alpha_tilde_sigma=1.0,
    beta_tilde_sigma=1.0,
    a=1.0,
    b=1.0,
    c=10.0,
    prior=True,
):
    """Heterotopic SNMGP (reference `logpos_hadamard`, logpos.py:502-563):
    K = K_x ∘ B_f[indx, indx'] on the N observed points only."""
    N = y.shape[0]
    M = num_tasks
    p = snmgp_unflatten(pars, N, M)
    # NOTE: reference applies `vec2lowtriangle` directly to the raw vec here
    # (logpos.py:517) — no exp-diagonal transform — and puts the N(0,c) prior
    # on L_vec itself (logpos.py:551); replicated.
    L = vec_to_tril(p.uL_vec, M)
    B_f = L @ L.T
    l = jnp.exp(p.tilde_l)
    sigma = jnp.exp(p.tilde_sigma)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    K_x = nonstationary_rbf(x, sigma1=sigma, ell1=l) + MCMC_JITTER * jnp.eye(
        N, dtype=x.dtype
    )
    K_i = B_f[indx[:, None], indx[None, :]]
    S = K_x * K_i + sigma2_err * jnp.eye(N, dtype=x.dtype)
    res = mvn_logpdf_dense(y, jnp.zeros_like(y), S)
    if prior:
        res = res + _gp_prior(p.tilde_l, x, mu_tilde_l, alpha_tilde_l, beta_tilde_l)
        res = res + _gp_prior(
            p.tilde_sigma, x, mu_tilde_sigma, alpha_tilde_sigma, beta_tilde_sigma
        )
        res = res + jnp.sum(_normal_logpdf(p.uL_vec, 0.0, c))
        res = res + inverse_gamma_logpdf_u(sigma2_err, alpha=a, beta=b)
        res = res + p.tilde_sigma2_err
    return res


def svc_hadamard_log_posterior(
    pars,
    x,
    indx,
    y,
    num_tasks: int,
    mu_tilde_l=0.0,
    alpha_tilde_l=1.0,
    beta_tilde_l=1.0,
    mu_L=0.0,
    alpha_L=1.0,
    beta_L=1.0,
    a=1.0,
    b=1.0,
    prior=True,
):
    """Heterotopic SVC (reference `logpos_hadamard_SVC`, logpos.py:588-659):
    K_i[n,m] = <L_f[n, indx[n], :], L_f[m, indx[m], :]> on observed points.

    NOTE: like the reference (logpos.py:603-604), the per-point Cholesky
    stack here uses the *raw* L_vecs (no exp-diagonal transform).
    """
    N = y.shape[0]
    M = num_tasks
    T = tri_size(M)
    p = svc_unflatten(pars, N, M)
    L_f = vec_to_tril(p.uL_vecs.reshape(N, T), M)  # (N, M, M) raw
    rows = L_f[jnp.arange(N), indx, :]  # (N, M)
    K_i = rows @ rows.T
    l = jnp.exp(p.tilde_l)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    K_x = nonstationary_rbf(x, ell1=l) + MCMC_JITTER * jnp.eye(N, dtype=x.dtype)
    S = K_x * K_i + sigma2_err * jnp.eye(N, dtype=x.dtype)
    res = mvn_logpdf_dense(y, jnp.zeros_like(y), S)
    if prior:
        res = res + _gp_prior(p.tilde_l, x, mu_tilde_l, alpha_tilde_l, beta_tilde_l)
        U = p.uL_vecs.reshape(N, T)
        Sigma_L = rbf(x, x, alpha_L**2, beta_L) + _prior_jitter(x.dtype, alpha_L) * jnp.eye(
            N, dtype=x.dtype
        )
        chol = jnp.linalg.cholesky(Sigma_L)
        sol = jax.scipy.linalg.solve_triangular(chol, U - mu_L, lower=True)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        res = res + jnp.sum(
            -0.5 * jnp.sum(sol**2, axis=0) - 0.5 * logdet - 0.5 * N * jnp.log(2 * jnp.pi)
        )
        res = res + inverse_gamma_logpdf_u(sigma2_err, alpha=a, beta=b)
        res = res + p.tilde_sigma2_err
    return res


def lmc_hadamard_log_posterior(
    pars,
    x,
    indx,
    y,
    num_tasks: int,
    mu_tilde_l=0.0,
    sigma_tilde_l=1.0,
    a=1.0,
    b=1.0,
    c=10.0,
    prior=True,
):
    """Heterotopic stationary LMC (reference `logpos_hadamard_S`,
    logpos.py:676-716): K = RBF(alpha=sigma, beta=l) ∘ B_f gather."""
    N = y.shape[0]
    M = num_tasks
    p = lmc_unflatten(pars, M)
    L = vec_to_tril(p.uL_vec, M)
    B_f = L @ L.T
    l = jnp.exp(p.tilde_l)
    sigma = jnp.exp(p.tilde_sigma)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    K_x = rbf(x, x, sigma**2, l) + MCMC_JITTER * jnp.eye(N, dtype=x.dtype)
    K_i = B_f[indx[:, None], indx[None, :]]
    S = K_x * K_i + sigma2_err * jnp.eye(N, dtype=x.dtype)
    res = mvn_logpdf_dense(y, jnp.zeros_like(y), S)
    if prior:
        res = res + _normal_logpdf(p.tilde_l, mu_tilde_l, sigma_tilde_l)
        res = res + jnp.sum(_normal_logpdf(p.uL_vec, 0.0, c))
        res = res + inverse_gamma_logpdf_u(sigma2_err, alpha=a, beta=b)
        res = res + p.tilde_sigma2_err
    return res


# ---------------------------------------------------------------------------
# Whitened (non-centered) parameterizations
# ---------------------------------------------------------------------------
#
# GP latent-field posteriors are stiff in the centered parameterization
# (SURVEY.md §7.3): the prior correlation structure couples coordinates on
# wildly different scales.  Whitening maps eta ~ N(0, I) through the prior
# Cholesky, so NUTS samples a near-isotropic space:
#   tilde_l = mu + L_prior eta,   L_prior = chol(K_RBF(alpha, beta) + jitter)
# The prior term on eta is exactly standard normal (the deterministic
# transform replaces the GP prior; no extra Jacobian since we also *report*
# in eta-space and transform draws afterwards).


def svc_whiten_chols(x, alpha_tilde_l, beta_tilde_l, alpha_L, beta_L):
    """Prior Choleskys used by the whitened SVC parameterization."""
    N = x.shape[0]
    eye = jnp.eye(N, dtype=x.dtype)
    S_l = rbf(x, x, alpha_tilde_l**2, beta_tilde_l) + _prior_jitter(
        x.dtype, alpha_tilde_l
    ) * eye
    S_L = rbf(x, x, alpha_L**2, beta_L) + _prior_jitter(x.dtype, alpha_L) * eye
    return jnp.linalg.cholesky(S_l), jnp.linalg.cholesky(S_L)


def svc_unwhiten(pars_white, x, mu_tilde_l, mu_L, chol_l, chol_L, M: int):
    """eta-space flat vector -> centered SVCPars."""
    N = x.shape[0]
    T = tri_size(M)
    p = svc_unflatten(pars_white, N, M)
    tilde_l = mu_tilde_l + chol_l @ p.tilde_l
    eta_U = p.uL_vecs.reshape(N, T)
    U = mu_L + chol_L @ eta_U
    return SVCPars(tilde_l, U.reshape(-1), p.tilde_sigma2_err)


def svc_log_posterior_whitened(
    pars_white,
    Y,
    x,
    chol_l,
    chol_L,
    mu_tilde_l=0.0,
    mu_L=0.0,
    a=1.0,
    b=1.0,
):
    """Whitened SVC log posterior: same posterior as `svc_log_posterior`
    under the transform `svc_unwhiten`, with N(0, I) priors on the etas."""
    N, M = Y.shape
    p = svc_unwhiten(pars_white, x, mu_tilde_l, mu_L, chol_l, chol_L, M)
    y = Y.T.reshape(-1)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    K, _ = svc_covariance(p.tilde_l, p.uL_vecs, x)
    S = K + sigma2_err * jnp.eye(N * M, dtype=x.dtype)
    res = mvn_logpdf_dense(y, jnp.zeros_like(y), S)
    eta = pars_white[:-1]
    res = res - 0.5 * jnp.sum(eta**2)  # standard-normal prior on all etas
    res = res + inverse_gamma_logpdf(sigma2_err, alpha=a, beta=b)
    res = res + p.tilde_sigma2_err
    return res


def snmgp_whiten_chols(
    x, alpha_tilde_l, beta_tilde_l, alpha_tilde_sigma, beta_tilde_sigma
):
    N = x.shape[0]
    eye = jnp.eye(N, dtype=x.dtype)
    S_l = rbf(x, x, alpha_tilde_l**2, beta_tilde_l) + _prior_jitter(
        x.dtype, alpha_tilde_l
    ) * eye
    S_s = rbf(x, x, alpha_tilde_sigma**2, beta_tilde_sigma) + _prior_jitter(
        x.dtype, alpha_tilde_sigma
    ) * eye
    return jnp.linalg.cholesky(S_l), jnp.linalg.cholesky(S_s)


def snmgp_unwhiten(pars_white, x, mu_tilde_l, mu_tilde_sigma, chol_l, chol_s, M: int):
    N = x.shape[0]
    p = snmgp_unflatten(pars_white, N, M)
    return SNMGPPars(
        mu_tilde_l + chol_l @ p.tilde_l,
        mu_tilde_sigma + chol_s @ p.tilde_sigma,
        p.uL_vec,
        p.tilde_sigma2_err,
    )


def snmgp_log_posterior_whitened(
    pars_white,
    Y,
    x,
    chol_l,
    chol_s,
    mu_tilde_l=0.0,
    mu_tilde_sigma=0.0,
    a=1.0,
    b=1.0,
    c=10.0,
):
    """Whitened SNMGP log posterior (non-centered tilde_l, tilde_sigma)."""
    N, M = Y.shape
    p = snmgp_unwhiten(pars_white, x, mu_tilde_l, mu_tilde_sigma, chol_l, chol_s, M)
    y = Y.T.reshape(-1)
    L = vec_to_tril(uvec_to_lvec(p.uL_vec, M), M)
    B_f = L @ L.T
    K_x = nonstationary_rbf(
        x, sigma1=jnp.exp(p.tilde_sigma), ell1=jnp.exp(p.tilde_l)
    ) + MCMC_JITTER * jnp.eye(N, dtype=x.dtype)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    res = _kron_loglik_robust(y, B_f, K_x, sigma2_err)
    pw = snmgp_unflatten(pars_white, N, M)
    res = res - 0.5 * jnp.sum(pw.tilde_l**2) - 0.5 * jnp.sum(pw.tilde_sigma**2)
    res = res + jnp.sum(_normal_logpdf(p.uL_vec, 0.0, c))
    res = res + inverse_gamma_logpdf(sigma2_err, alpha=a, beta=b)
    res = res + p.tilde_sigma2_err
    return res


def make_nlp(log_posterior, *args, **kwargs):
    """Negative-log-posterior objective closure (the `nlogpos_obj*` family,
    logpos.py:216-234 etc.) for optimizers/samplers."""

    def nlp(pars):
        return -log_posterior(pars, *args, **kwargs)

    return nlp
