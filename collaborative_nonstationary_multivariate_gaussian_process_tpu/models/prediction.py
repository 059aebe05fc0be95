"""Posterior prediction from MCMC histories / MAP estimates.

TPU-native re-design of the reference's `SIM_code/Utility/prediction.py`
(~24 functions, prediction.py:34-1758).  The reference triple-loops
(grid x posterior-draw x variant) in Python, re-eigendecomposing the train
covariance for every (grid, draw) pair.  Here each variant provides:

  1. `*_precompute(draw, Y, x, hypers)`  — per-draw cached factorization
     (Kronecker eigendecomposition or dense Cholesky of the train
     covariance, prior Cholesky solves for the latent processes);
  2. `*_predict_point(cache, x_star, key)` — conditional draws of the
     latent processes at x_star + the Gaussian predictive y* draw;

and the public drivers vmap stage 2 over grid points and stage 1+2 over
posterior draws — one jitted dispatch, decompositions amortized over the
whole grid.  Variance floors mirror `settings.precision` clipping
(prediction.py:59-60,121).

Supported variants (matching the reference's function families):
  SNMGP  isotopic:    snmgp_predsample / snmgp_predmap(+_sampling)
  SVC    isotopic:    svc_predsample / svc_predmap(+_sampling)
  LMC    isotopic:    lmc_predsample / lmc_predmap
  Hadamard variants:  *_hadamard_* (heterotopic flat data)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MCMC_JITTER, PRECISION
from ..ops.kernels import nonstationary_rbf, rbf
from ..ops.linalg import uvec_to_lvec, vec_to_tril
from .logdensities import svc_covariance, tri_size

__all__ = [
    "snmgp_predsample",
    "snmgp_predmap_sampling",
    "svc_predsample",
    "svc_predmap_sampling",
    "lmc_predsample",
    "snmgp_hadamard_predsample",
    "lmc_hadamard_predsample",
    "svc_hadamard_predsample",
]


def _cond_gp_draw(key, vals, x, x_star, mu, alpha, beta, jitter=None):
    """Conditional draw of a latent GP at x_star given its values at x under
    a stationary RBF prior (prediction.py:52-71 idiom).

    Returns a scalar sample.  x: (N,), vals: (N,), x_star: scalar.
    """
    from .logdensities import _prior_jitter

    if jitter is None:
        jitter = _prior_jitter(x.dtype, alpha)
    N = x.shape[0]
    S = rbf(x, x, alpha**2, beta) + jitter * jnp.eye(N, dtype=x.dtype)
    kxs = rbf(x, x_star[None], alpha**2, beta)[:, 0]  # (N,)
    L = jnp.linalg.cholesky(S)
    w = jax.scipy.linalg.cho_solve((L, True), kxs)
    mean = mu + jnp.dot(w, vals - mu)
    var = alpha**2 - jnp.dot(w, kxs)
    var = jnp.maximum(var, PRECISION)
    return mean + jnp.sqrt(var) * jax.random.normal(key, dtype=x.dtype)


# ---------------------------------------------------------------------------
# SNMGP (separable): Kronecker-eig cache
# ---------------------------------------------------------------------------


class _SNMGPCache(NamedTuple):
    tilde_l: jax.Array
    tilde_sigma: jax.Array
    B_f: jax.Array  # (M, M)
    w_B: jax.Array
    v_B: jax.Array
    w_K: jax.Array
    v_K: jax.Array
    wt: jax.Array  # 1/(sigma2_err + w_B ⊗ w_K), (MN,)
    b: jax.Array  # Uᵀ y in eigenbasis, (MN,)
    sigma2_err: jax.Array
    x: jax.Array
    l: jax.Array
    sigma: jax.Array


def _snmgp_precompute(draw, Y, x) -> _SNMGPCache:
    """Per-draw factorization (the eig + Uᵀy of prediction.py:86-97)."""
    N, M = Y.shape
    tilde_l, tilde_sigma, uL_vec, tilde_s2e = draw
    y = Y.T.reshape(-1)
    L = vec_to_tril(uvec_to_lvec(uL_vec, M), M)
    B_f = L @ L.T
    l = jnp.exp(tilde_l)
    sigma = jnp.exp(tilde_sigma)
    sigma2_err = jnp.exp(tilde_s2e)
    K_x = nonstationary_rbf(x, sigma1=sigma, ell1=l) + MCMC_JITTER * jnp.eye(
        N, dtype=x.dtype
    )
    w_B, v_B = jnp.linalg.eigh(B_f)
    w_K, v_K = jnp.linalg.eigh(K_x)
    t = (w_B[:, None] * w_K[None, :]).reshape(-1)
    wt = 1.0 / (sigma2_err + t)
    # b = (v_B ⊗ v_K)ᵀ y  — task-major kron_mv
    b = (v_K.T @ y.reshape(M, N).T @ v_B).T.reshape(-1)
    return _SNMGPCache(
        tilde_l, tilde_sigma, B_f, w_B, v_B, w_K, v_K, wt, b, sigma2_err, x, l, sigma
    )


def _snmgp_predict_point(
    cache: _SNMGPCache,
    x_star,
    key,
    mu_tilde_l,
    alpha_tilde_l,
    beta_tilde_l,
    mu_tilde_sigma,
    alpha_tilde_sigma,
    beta_tilde_sigma,
):
    """Draw y*(M,) at scalar x_star (prediction.py:52-122, one iteration)."""
    k_l, k_s, k_y = jax.random.split(key, 3)
    tl_star = _cond_gp_draw(
        k_l, cache.tilde_l, cache.x, x_star, mu_tilde_l, alpha_tilde_l, beta_tilde_l
    )
    ts_star = _cond_gp_draw(
        k_s,
        cache.tilde_sigma,
        cache.x,
        x_star,
        mu_tilde_sigma,
        alpha_tilde_sigma,
        beta_tilde_sigma,
    )
    l_star = jnp.exp(tl_star)
    s_star = jnp.exp(ts_star)

    M = cache.B_f.shape[0]
    N = cache.x.shape[0]
    # cross-covariance k_x(x, x*) under the Gibbs kernel
    k_x = nonstationary_rbf(
        cache.x,
        x_star[None],
        sigma1=cache.sigma,
        ell1=cache.l,
        sigma2=s_star[None],
        ell2=l_star[None],
    )[:, 0]
    # A[m] = Uᵀ (B_f[:, m] ⊗ k_x) in the eigenbasis: (M, MN)
    kv = cache.v_K.T @ k_x  # (N,)
    A = (cache.v_B.T @ cache.B_f)[:, :, None] * kv[None, None, :]  # (Mb, M, N)
    A = A.transpose(1, 0, 2).reshape(M, -1)  # rows: output m, cols: eigenbasis
    mu_f = A @ (cache.b * cache.wt)
    prior_var = jnp.diag(cache.B_f) * nonstationary_rbf(
        x_star[None], sigma1=s_star[None], ell1=l_star[None]
    )[0, 0]
    sigma2_f = prior_var - jnp.sum(A * A * cache.wt[None, :], axis=1)
    sigma2_y = jnp.maximum(sigma2_f + cache.sigma2_err, PRECISION)
    return mu_f + jnp.sqrt(sigma2_y) * jax.random.normal(k_y, (M,), cache.x.dtype)


def snmgp_predsample(
    hists,
    Y,
    x,
    x_stars,
    mu_tilde_l=0.0,
    alpha_tilde_l=1.0,
    beta_tilde_l=1.0,
    mu_tilde_sigma=0.0,
    alpha_tilde_sigma=1.0,
    beta_tilde_sigma=1.0,
    n_sample=None,
    seed=0,
):
    """Posterior predictive draws at x_stars from an MCMC history.

    hists: tuple (tilde_l_hist (S,N), tilde_sigma_hist (S,N),
    uL_vec_hist (S,T), tilde_sigma2_err_hist (S,)).  Returns
    (n_grid, S, M) like the reference `pointwise_predsample`
    (prediction.py:133-157) / `test_predsample` (:159-186).
    """
    Y = jnp.asarray(Y)
    x = jnp.asarray(x)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    hists = tuple(jnp.asarray(h) for h in hists)
    if n_sample is not None:
        hists = tuple(h[-n_sample:] for h in hists)
    S = hists[0].shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), S * x_stars.shape[0]).reshape(
        S, x_stars.shape[0], 2
    )

    predict = partial(
        _snmgp_predict_point,
        mu_tilde_l=mu_tilde_l,
        alpha_tilde_l=alpha_tilde_l,
        beta_tilde_l=beta_tilde_l,
        mu_tilde_sigma=mu_tilde_sigma,
        alpha_tilde_sigma=alpha_tilde_sigma,
        beta_tilde_sigma=beta_tilde_sigma,
    )

    @jax.jit
    def run():
        def per_draw(draw, ks):
            cache = _snmgp_precompute(draw, Y, x)
            return jax.vmap(lambda xs, k: predict(cache, xs, k))(x_stars, ks)

        out = jax.vmap(per_draw)(hists, keys)  # (S, n_grid, M)
        return out.transpose(1, 0, 2)

    return np.asarray(run())


def snmgp_predmap_sampling(
    n_sample,
    map_draw,
    Y,
    x,
    x_stars,
    seed=0,
    **hyper_kwargs,
):
    """MAP + conditional-sampling prediction (`point_predmap_sampling`,
    prediction.py:189-262): repeat the MAP estimate n_sample times."""
    hists = tuple(
        jnp.repeat(jnp.asarray(v)[None, ...], n_sample, axis=0) for v in map_draw
    )
    return snmgp_predsample(hists, Y, x, x_stars, seed=seed, **hyper_kwargs)


# ---------------------------------------------------------------------------
# SVC (varying covariance): dense-Cholesky cache
# ---------------------------------------------------------------------------


class _SVCCache(NamedTuple):
    tilde_l: jax.Array  # (N,)
    U: jax.Array  # (N, T) unconstrained entries
    L_f: jax.Array  # (N, M, M)
    chol_S: jax.Array  # (MN, MN)
    alpha: jax.Array  # S^{-1} y, (MN,)
    sigma2_err: jax.Array
    x: jax.Array
    l: jax.Array


def _svc_precompute(draw, Y, x) -> _SVCCache:
    N, M = Y.shape
    T = tri_size(M)
    tilde_l, uL_vecs, tilde_s2e = draw
    y = Y.T.reshape(-1)
    sigma2_err = jnp.exp(tilde_s2e)
    K, L_f = svc_covariance(tilde_l, uL_vecs, x)
    S = K + sigma2_err * jnp.eye(N * M, dtype=x.dtype)
    chol_S = jnp.linalg.cholesky(S)
    alpha = jax.scipy.linalg.cho_solve((chol_S, True), y)
    return _SVCCache(
        tilde_l, uL_vecs.reshape(N, T), L_f, chol_S, alpha, sigma2_err, x, jnp.exp(tilde_l)
    )


def _svc_predict_point(
    cache: _SVCCache,
    x_star,
    key,
    mu_tilde_l,
    alpha_tilde_l,
    beta_tilde_l,
    mu_L,
    alpha_L,
    beta_L,
):
    """One draw of y*(M,) at scalar x_star (prediction.py SVC family,
    point_predsample_inhomogeneous:1231-1312)."""
    N, Mdim, _ = cache.L_f.shape
    T = cache.U.shape[1]
    keys = jax.random.split(key, T + 2)
    tl_star = _cond_gp_draw(
        keys[0], cache.tilde_l, cache.x, x_star, mu_tilde_l, alpha_tilde_l, beta_tilde_l
    )
    l_star = jnp.exp(tl_star)
    # conditional draw of each unconstrained Cholesky-entry process
    u_star = jax.vmap(
        lambda col, k: _cond_gp_draw(k, col, cache.x, x_star, mu_L, alpha_L, beta_L)
    )(cache.U.T, keys[1 : T + 1])
    L_star = vec_to_tril(uvec_to_lvec(u_star, Mdim), Mdim)  # (M, M)

    # cross covariance: k[(i,n), j] = k_x(x_n, x*) <L_f[n,i,:], L_star[j,:]>
    k_x = nonstationary_rbf(cache.x, x_star[None], ell1=cache.l, ell2=l_star[None])[
        :, 0
    ]  # (N,)
    cross = jnp.einsum("n,nia,ja->inj", k_x, cache.L_f, L_star)  # (M, N, M)
    k_f = cross.reshape(Mdim * N, Mdim)
    mu_f = k_f.T @ cache.alpha
    prior = nonstationary_rbf(x_star[None], ell1=l_star[None])[0, 0] * (
        L_star @ L_star.T
    )
    V = jax.scipy.linalg.solve_triangular(cache.chol_S, k_f, lower=True)
    Sigma_f = prior - V.T @ V
    sigma2_y = jnp.maximum(jnp.diag(Sigma_f) + cache.sigma2_err, PRECISION)
    return mu_f + jnp.sqrt(sigma2_y) * jax.random.normal(
        keys[-1], (Mdim,), cache.x.dtype
    )


def svc_predsample(
    hists,
    Y,
    x,
    x_stars,
    mu_tilde_l=0.0,
    alpha_tilde_l=5.0,
    beta_tilde_l=1.0,
    mu_L=0.0,
    alpha_L=5.0,
    beta_L=1.0,
    n_sample=None,
    seed=0,
):
    """SVC posterior predictive over a grid: returns (n_grid, S, M).

    hists: (tilde_l_hist (S,N), uL_vecs_hist (S,N*T), tilde_s2e_hist (S,)).
    """
    Y = jnp.asarray(Y)
    x = jnp.asarray(x)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    hists = tuple(jnp.asarray(h) for h in hists)
    if n_sample is not None:
        hists = tuple(h[-n_sample:] for h in hists)
    S = hists[0].shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), S * x_stars.shape[0]).reshape(
        S, x_stars.shape[0], 2
    )
    predict = partial(
        _svc_predict_point,
        mu_tilde_l=mu_tilde_l,
        alpha_tilde_l=alpha_tilde_l,
        beta_tilde_l=beta_tilde_l,
        mu_L=mu_L,
        alpha_L=alpha_L,
        beta_L=beta_L,
    )

    @jax.jit
    def run():
        def per_draw(draw, ks):
            cache = _svc_precompute(draw, Y, x)
            return jax.vmap(lambda xs, k: predict(cache, xs, k))(x_stars, ks)

        out = jax.vmap(per_draw)(hists, keys)
        return out.transpose(1, 0, 2)

    return np.asarray(run())


def svc_predmap_sampling(n_sample, map_draw, Y, x, x_stars, seed=0, **kw):
    hists = tuple(
        jnp.repeat(jnp.asarray(v)[None, ...], n_sample, axis=0) for v in map_draw
    )
    return svc_predsample(hists, Y, x, x_stars, seed=seed, **kw)


# ---------------------------------------------------------------------------
# LMC (stationary): SNMGP machinery with constant latent processes
# ---------------------------------------------------------------------------


def lmc_predsample(hists, Y, x, x_stars, n_sample=None, seed=0):
    """Stationary LMC predictive (`prediction.py` *_S family): scalar
    (tilde_l, tilde_sigma) need no conditional GP draw — the latent
    processes are constant, so x* uses the same values."""
    Y = jnp.asarray(Y)
    x = jnp.asarray(x)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    tilde_l_h, tilde_sigma_h, uL_h, ts2e_h = (jnp.asarray(h) for h in hists)
    if n_sample is not None:
        tilde_l_h, tilde_sigma_h, uL_h, ts2e_h = (
            h[-n_sample:] for h in (tilde_l_h, tilde_sigma_h, uL_h, ts2e_h)
        )
    N = x.shape[0]
    S = tilde_l_h.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), S * x_stars.shape[0]).reshape(
        S, x_stars.shape[0], 2
    )

    @jax.jit
    def run():
        def per_draw(tl, ts, uL, ts2e, ks):
            draw = (
                tl * jnp.ones(N, x.dtype),
                ts * jnp.ones(N, x.dtype),
                uL,
                ts2e,
            )
            cache = _snmgp_precompute(draw, Y, x)

            def point(xs, k):
                # constant latent processes: no conditional draw needed
                l_star = jnp.exp(tl)
                s_star = jnp.exp(ts)
                M = cache.B_f.shape[0]
                k_x = nonstationary_rbf(
                    cache.x,
                    xs[None],
                    sigma1=cache.sigma,
                    ell1=cache.l,
                    sigma2=s_star[None],
                    ell2=l_star[None],
                )[:, 0]
                kv = cache.v_K.T @ k_x
                A = (cache.v_B.T @ cache.B_f)[:, :, None] * kv[None, None, :]
                A = A.transpose(1, 0, 2).reshape(M, -1)
                mu_f = A @ (cache.b * cache.wt)
                prior_var = jnp.diag(cache.B_f) * (s_star**2)
                sigma2_f = prior_var - jnp.sum(A * A * cache.wt[None, :], axis=1)
                sigma2_y = jnp.maximum(sigma2_f + cache.sigma2_err, PRECISION)
                return mu_f + jnp.sqrt(sigma2_y) * jax.random.normal(
                    k, (M,), x.dtype
                )

            return jax.vmap(point)(x_stars, ks)

        out = jax.vmap(per_draw)(tilde_l_h, tilde_sigma_h, uL_h, ts2e_h, keys)
        return out.transpose(1, 0, 2)

    return np.asarray(run())


# ---------------------------------------------------------------------------
# Hadamard (heterotopic) variants: flat (x, indx, y) training data
# ---------------------------------------------------------------------------


def _hadamard_predict_factory(build_Ki_cross):
    """Shared skeleton for hadamard predictives: dense N x N train cov."""

    def predict(cache, x_star, latents_star, key):
        (x, chol_S, alpha, sigma2_err, extras) = cache
        k_x_cross, prior_var_fn = build_Ki_cross(extras, x, x_star, latents_star)
        mu_f = k_x_cross.T @ alpha  # (M,)
        V = jax.scipy.linalg.solve_triangular(chol_S, k_x_cross, lower=True)
        sigma2_f = prior_var_fn() - jnp.sum(V * V, axis=0)
        sigma2_y = jnp.maximum(sigma2_f + sigma2_err, PRECISION)
        return mu_f + jnp.sqrt(sigma2_y) * jax.random.normal(
            key, mu_f.shape, x.dtype
        )

    return predict


def snmgp_hadamard_predsample(
    hists,
    x,
    indx,
    y,
    num_tasks,
    x_stars,
    mu_tilde_l=0.0,
    alpha_tilde_l=1.0,
    beta_tilde_l=1.0,
    mu_tilde_sigma=0.0,
    alpha_tilde_sigma=1.0,
    beta_tilde_sigma=1.0,
    n_sample=None,
    seed=0,
):
    """Heterotopic SNMGP predictive (prediction.py hadamard family):
    K = K_x ∘ B_f[indx,indx'] on observed points; returns (n_grid, S, M)."""
    x = jnp.asarray(x)
    indx = jnp.asarray(indx)
    y = jnp.asarray(y)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    hists = tuple(jnp.asarray(h) for h in hists)
    if n_sample is not None:
        hists = tuple(h[-n_sample:] for h in hists)
    S = hists[0].shape[0]
    M = num_tasks
    N = x.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), S * x_stars.shape[0] * 3).reshape(
        S, x_stars.shape[0], 3, 2
    )

    @jax.jit
    def run():
        def per_draw(draw, ks):
            tilde_l, tilde_sigma, L_vec, ts2e = draw
            # reference hadamard uses raw L_vec (logpos.py:517)
            L = vec_to_tril(L_vec, M)
            B_f = L @ L.T
            l = jnp.exp(tilde_l)
            sig = jnp.exp(tilde_sigma)
            s2e = jnp.exp(ts2e)
            K_x = nonstationary_rbf(x, sigma1=sig, ell1=l) + MCMC_JITTER * jnp.eye(
                N, dtype=x.dtype
            )
            K_i = B_f[indx[:, None], indx[None, :]]
            Smat = K_x * K_i + s2e * jnp.eye(N, dtype=x.dtype)
            chol_S = jnp.linalg.cholesky(Smat)
            alpha = jax.scipy.linalg.cho_solve((chol_S, True), y)

            def point(xs, kk):
                tl_star = _cond_gp_draw(
                    jax.random.fold_in(kk[0, 0], 0) * 0 + kk[0],
                    tilde_l,
                    x,
                    xs,
                    mu_tilde_l,
                    alpha_tilde_l,
                    beta_tilde_l,
                ) if False else _cond_gp_draw(
                    kk[0], tilde_l, x, xs, mu_tilde_l, alpha_tilde_l, beta_tilde_l
                )
                ts_star = _cond_gp_draw(
                    kk[1],
                    tilde_sigma,
                    x,
                    xs,
                    mu_tilde_sigma,
                    alpha_tilde_sigma,
                    beta_tilde_sigma,
                )
                l_star = jnp.exp(tl_star)
                s_star = jnp.exp(ts_star)
                k_x = nonstationary_rbf(
                    x, xs[None], sigma1=sig, ell1=l, sigma2=s_star[None], ell2=l_star[None]
                )[:, 0]
                # cross for all M outputs: (N, M)
                cross = k_x[:, None] * B_f[indx, :]
                mu_f = cross.T @ alpha
                V = jax.scipy.linalg.solve_triangular(chol_S, cross, lower=True)
                prior_var = jnp.diag(B_f) * (s_star**2)
                sigma2_y = jnp.maximum(prior_var - jnp.sum(V * V, axis=0) + s2e, PRECISION)
                return mu_f + jnp.sqrt(sigma2_y) * jax.random.normal(
                    kk[2], (M,), x.dtype
                )

            return jax.vmap(point)(x_stars, ks)

        out = jax.vmap(per_draw)(hists, keys)
        return out.transpose(1, 0, 2)

    return np.asarray(run())


def lmc_hadamard_predsample(hists, x, indx, y, num_tasks, x_stars, n_sample=None, seed=0):
    """Heterotopic stationary LMC predictive (prediction.py *_S hadamard)."""
    x = jnp.asarray(x)
    indx = jnp.asarray(indx)
    y = jnp.asarray(y)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    hists = tuple(jnp.asarray(h) for h in hists)
    if n_sample is not None:
        hists = tuple(h[-n_sample:] for h in hists)
    S = hists[0].shape[0]
    M = num_tasks
    N = x.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), S * x_stars.shape[0]).reshape(
        S, x_stars.shape[0], 2
    )

    @jax.jit
    def run():
        def per_draw(draw, ks):
            tl, ts, L_vec, ts2e = draw
            L = vec_to_tril(L_vec, M)
            B_f = L @ L.T
            l = jnp.exp(tl)
            sig = jnp.exp(ts)
            s2e = jnp.exp(ts2e)
            K_x = rbf(x, x, sig**2, l) + MCMC_JITTER * jnp.eye(N, dtype=x.dtype)
            K_i = B_f[indx[:, None], indx[None, :]]
            Smat = K_x * K_i + s2e * jnp.eye(N, dtype=x.dtype)
            chol_S = jnp.linalg.cholesky(Smat)
            alpha = jax.scipy.linalg.cho_solve((chol_S, True), y)

            def point(xs, kk):
                k_x = rbf(x, xs[None], sig**2, l)[:, 0]
                cross = k_x[:, None] * B_f[indx, :]
                mu_f = cross.T @ alpha
                V = jax.scipy.linalg.solve_triangular(chol_S, cross, lower=True)
                prior_var = jnp.diag(B_f) * (sig**2)
                sigma2_y = jnp.maximum(prior_var - jnp.sum(V * V, axis=0) + s2e, PRECISION)
                return mu_f + jnp.sqrt(sigma2_y) * jax.random.normal(kk, (M,), x.dtype)

            return jax.vmap(point)(x_stars, ks)

        out = jax.vmap(per_draw)(hists, keys)
        return out.transpose(1, 0, 2)

    return np.asarray(run())


def svc_hadamard_predsample(
    hists,
    x,
    indx,
    y,
    num_tasks,
    x_stars,
    mu_tilde_l=0.0,
    alpha_tilde_l=1.0,
    beta_tilde_l=1.0,
    mu_L=0.0,
    alpha_L=1.0,
    beta_L=1.0,
    n_sample=None,
    seed=0,
):
    """Heterotopic SVC predictive (`*_inhomogeneous` family,
    prediction.py:1231-1325).  Raw per-point Cholesky vecs (no exp-diag),
    matching logpos_hadamard_SVC."""
    x = jnp.asarray(x)
    indx = jnp.asarray(indx)
    y = jnp.asarray(y)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    hists = tuple(jnp.asarray(h) for h in hists)
    if n_sample is not None:
        hists = tuple(h[-n_sample:] for h in hists)
    S = hists[0].shape[0]
    M = num_tasks
    N = x.shape[0]
    T = tri_size(M)
    keys = jax.random.split(
        jax.random.PRNGKey(seed), S * x_stars.shape[0] * (T + 2)
    ).reshape(S, x_stars.shape[0], T + 2, 2)

    @jax.jit
    def run():
        def per_draw(draw, ks):
            tilde_l, L_vecs, ts2e = draw
            U = L_vecs.reshape(N, T)
            L_f = vec_to_tril(U, M)  # (N, M, M) raw
            rows = L_f[jnp.arange(N), indx, :]  # (N, M)
            l = jnp.exp(tilde_l)
            s2e = jnp.exp(ts2e)
            K_x = nonstationary_rbf(x, ell1=l) + MCMC_JITTER * jnp.eye(N, dtype=x.dtype)
            Smat = K_x * (rows @ rows.T) + s2e * jnp.eye(N, dtype=x.dtype)
            chol_S = jnp.linalg.cholesky(Smat)
            alpha = jax.scipy.linalg.cho_solve((chol_S, True), y)

            def point(xs, kk):
                tl_star = _cond_gp_draw(
                    kk[0], tilde_l, x, xs, mu_tilde_l, alpha_tilde_l, beta_tilde_l
                )
                u_star = jax.vmap(
                    lambda col, k: _cond_gp_draw(k, col, x, xs, mu_L, alpha_L, beta_L)
                )(U.T, kk[1 : T + 1])
                L_star = vec_to_tril(u_star, M)  # raw
                l_star = jnp.exp(tl_star)
                k_x = nonstationary_rbf(x, xs[None], ell1=l, ell2=l_star[None])[:, 0]
                cross = k_x[:, None] * (rows @ L_star.T)  # (N, M)
                mu_f = cross.T @ alpha
                V = jax.scipy.linalg.solve_triangular(chol_S, cross, lower=True)
                prior_var = jnp.diag(L_star @ L_star.T) * nonstationary_rbf(
                    xs[None], ell1=l_star[None]
                )[0, 0]
                sigma2_y = jnp.maximum(prior_var - jnp.sum(V * V, axis=0) + s2e, PRECISION)
                return mu_f + jnp.sqrt(sigma2_y) * jax.random.normal(
                    kk[-1], (M,), x.dtype
                )

            return jax.vmap(point)(x_stars, ks)

        out = jax.vmap(per_draw)(hists, keys)
        return out.transpose(1, 0, 2)

    return np.asarray(run())
