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
    "snmgp_predmap",
    "snmgp_predmap_sampling",
    "svc_predsample",
    "svc_predmap",
    "svc_predmap_sampling",
    "lmc_predsample",
    "lmc_predmap",
    "snmgp_latent_predsample",
    "svc_latent_predsample",
    "snmgp_hadamard_predsample",
    "snmgp_hadamard_predmap",
    "lmc_hadamard_predsample",
    "lmc_hadamard_predmap",
    "svc_hadamard_predsample",
    "svc_hadamard_predmap",
    "snmgp_hadamard_indexedpoint_predsample",
    "snmgp_hadamard_indexedpoint_predmap",
    "svc_hadamard_indexedpoint_predmap",
    "lmc_hadamard_indexedpoint_predmap",
    "svc_hadamard_indexedpoint_predsample",
    "lmc_hadamard_indexedpoint_predsample",
]


def _cond_gp_moments(vals, x, x_star, mu, alpha, beta, jitter=None):
    """Conditional mean/variance of a latent GP at x_star given its values at
    x under a stationary RBF prior (prediction.py:52-71 idiom).

    x: (N,), vals: (N,), x_star: scalar.  Returns (mean, var) scalars; var is
    floored at settings.precision like the reference (prediction.py:59-60).
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
    return mean, jnp.maximum(var, PRECISION)


def _cond_gp_draw(key, vals, x, x_star, mu, alpha, beta, jitter=None):
    """Conditional draw of a latent GP at x_star (see `_cond_gp_moments`)."""
    mean, var = _cond_gp_moments(vals, x, x_star, mu, alpha, beta, jitter)
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


def _snmgp_ystar_moments(cache: _SNMGPCache, x_star, l_star, s_star):
    """Predictive (mu_y, sigma2_y) of y*(M,) at scalar x_star given latent
    values (l_star, s_star) there (prediction.py:84-122 math)."""
    M = cache.B_f.shape[0]
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
    return mu_f, sigma2_y


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
    mu_f, sigma2_y = _snmgp_ystar_moments(
        cache, x_star, jnp.exp(tl_star), jnp.exp(ts_star)
    )
    M = cache.B_f.shape[0]
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


def snmgp_predmap(
    map_draw,
    Y,
    x,
    x_stars,
    mu_tilde_l=0.0,
    alpha_tilde_l=1.0,
    beta_tilde_l=1.0,
    mu_tilde_sigma=0.0,
    alpha_tilde_sigma=1.0,
    beta_tilde_sigma=1.0,
):
    """Analytic plug-in MAP prediction (`point_predmap`/`pointwise_predmap`/
    `test_predmap`, prediction.py:337-459): latent processes at x* set to
    their conditional *means*, predictive y* moments computed in closed form.

    Returns (3, n_grid, M): [mu - 1.96 sigma, mu, mu + 1.96 sigma], the
    reference's `percentile_y` stack (prediction.py:405-407).
    """
    Y = jnp.asarray(Y)
    x = jnp.asarray(x)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    draw = tuple(jnp.asarray(v) for v in map_draw)

    @jax.jit
    def run():
        cache = _snmgp_precompute(draw, Y, x)

        def point(xs):
            ml, _ = _cond_gp_moments(
                cache.tilde_l, cache.x, xs, mu_tilde_l, alpha_tilde_l, beta_tilde_l
            )
            ms, _ = _cond_gp_moments(
                cache.tilde_sigma,
                cache.x,
                xs,
                mu_tilde_sigma,
                alpha_tilde_sigma,
                beta_tilde_sigma,
            )
            mu_f, sigma2_y = _snmgp_ystar_moments(cache, xs, jnp.exp(ml), jnp.exp(ms))
            sd = jnp.sqrt(sigma2_y)
            return jnp.stack([mu_f - 1.96 * sd, mu_f, mu_f + 1.96 * sd])

        return jax.vmap(point, out_axes=1)(x_stars)  # (3, n_grid, M)

    return np.asarray(run())


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


def _svc_ystar_moments(cache: _SVCCache, x_star, l_star, L_star):
    """Predictive (mu_y, sigma2_y) of y*(M,) at scalar x_star given latent
    values (l_star, L_star) there (prediction.py:1285-1312 math)."""
    N, Mdim, _ = cache.L_f.shape
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
    return mu_f, sigma2_y


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
    # conditional draw of each unconstrained Cholesky-entry process
    u_star = jax.vmap(
        lambda col, k: _cond_gp_draw(k, col, cache.x, x_star, mu_L, alpha_L, beta_L)
    )(cache.U.T, keys[1 : T + 1])
    L_star = vec_to_tril(uvec_to_lvec(u_star, Mdim), Mdim)  # (M, M)
    mu_f, sigma2_y = _svc_ystar_moments(cache, x_star, jnp.exp(tl_star), L_star)
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


def svc_predmap(
    map_draw,
    Y,
    x,
    x_stars,
    mu_tilde_l=0.0,
    alpha_tilde_l=5.0,
    beta_tilde_l=1.0,
    mu_L=0.0,
    alpha_L=5.0,
    beta_L=1.0,
):
    """Analytic plug-in SVC MAP prediction (`point_predmap_inhomogeneous`,
    prediction.py:912-1036): conditional *means* of tilde_l* and of every
    unconstrained Cholesky-entry process at x*, closed-form y* moments.

    Returns (3, n_grid, M): [mu - 1.96 sigma, mu, mu + 1.96 sigma].
    """
    Y = jnp.asarray(Y)
    x = jnp.asarray(x)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    draw = tuple(jnp.asarray(v) for v in map_draw)
    Mdim = Y.shape[1]

    @jax.jit
    def run():
        cache = _svc_precompute(draw, Y, x)

        def point(xs):
            ml, _ = _cond_gp_moments(
                cache.tilde_l, cache.x, xs, mu_tilde_l, alpha_tilde_l, beta_tilde_l
            )
            u_star = jax.vmap(
                lambda col: _cond_gp_moments(col, cache.x, xs, mu_L, alpha_L, beta_L)[0]
            )(cache.U.T)
            L_star = vec_to_tril(uvec_to_lvec(u_star, Mdim), Mdim)
            mu_f, sigma2_y = _svc_ystar_moments(cache, xs, jnp.exp(ml), L_star)
            sd = jnp.sqrt(sigma2_y)
            return jnp.stack([mu_f - 1.96 * sd, mu_f, mu_f + 1.96 * sd])

        return jax.vmap(point, out_axes=1)(x_stars)

    return np.asarray(run())


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
                M = cache.B_f.shape[0]
                mu_f, sigma2_y = _snmgp_ystar_moments(
                    cache, xs, jnp.exp(tl), jnp.exp(ts)
                )
                return mu_f + jnp.sqrt(sigma2_y) * jax.random.normal(
                    k, (M,), x.dtype
                )

            return jax.vmap(point)(x_stars, ks)

        out = jax.vmap(per_draw)(tilde_l_h, tilde_sigma_h, uL_h, ts2e_h, keys)
        return out.transpose(1, 0, 2)

    return np.asarray(run())


def lmc_predmap(map_draw, Y, x, x_stars):
    """Analytic plug-in stationary-LMC MAP prediction
    (`pointwise_predmap_S`/`test_predmap_S`, prediction.py:1532-1604).

    map_draw: (tilde_l, tilde_sigma, uL_vec, tilde_sigma2_err) scalars/vec.
    Returns (3, n_grid, M): [mu - 1.96 sigma, mu, mu + 1.96 sigma].
    """
    Y = jnp.asarray(Y)
    x = jnp.asarray(x)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    tl, ts, uL, ts2e = (jnp.asarray(v) for v in map_draw)
    N = x.shape[0]

    @jax.jit
    def run():
        draw = (tl * jnp.ones(N, x.dtype), ts * jnp.ones(N, x.dtype), uL, ts2e)
        cache = _snmgp_precompute(draw, Y, x)

        def point(xs):
            mu_f, sigma2_y = _snmgp_ystar_moments(cache, xs, jnp.exp(tl), jnp.exp(ts))
            sd = jnp.sqrt(sigma2_y)
            return jnp.stack([mu_f - 1.96 * sd, mu_f, mu_f + 1.96 * sd])

        return jax.vmap(point, out_axes=1)(x_stars)

    return np.asarray(run())


# ---------------------------------------------------------------------------
# Latent-process prediction (the reference's `pred_smoothness` / `pred_cov`
# modes of point_predmap_inhomogeneous_sampling, prediction.py:1038-1160,
# used by synthetic_plot.py for lengthscale / covariance-process recovery)
# ---------------------------------------------------------------------------


def snmgp_latent_predsample(
    hists,
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
    """Conditional draws of the SNMGP latent processes at x_stars.

    hists: (tilde_l_hist (S,N), tilde_sigma_hist (S,N)) — extra history
    entries are ignored, so the full 4-tuple may be passed.  Returns
    (tilde_l_stars, tilde_sigma_stars) each (S, n_grid).
    """
    x = jnp.asarray(x)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    tl_h = jnp.asarray(hists[0])
    ts_h = jnp.asarray(hists[1])
    if n_sample is not None:
        tl_h, ts_h = tl_h[-n_sample:], ts_h[-n_sample:]
    S, G = tl_h.shape[0], x_stars.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), S * G * 2).reshape(S, G, 2, 2)

    @jax.jit
    def run():
        def per_draw(tl, ts, ks):
            def point(xs, kk):
                a = _cond_gp_draw(
                    kk[0], tl, x, xs, mu_tilde_l, alpha_tilde_l, beta_tilde_l
                )
                b = _cond_gp_draw(
                    kk[1],
                    ts,
                    x,
                    xs,
                    mu_tilde_sigma,
                    alpha_tilde_sigma,
                    beta_tilde_sigma,
                )
                return a, b

            return jax.vmap(point)(x_stars, ks)

        return jax.vmap(per_draw)(tl_h, ts_h, keys)

    a, b = run()
    return np.asarray(a), np.asarray(b)


def svc_latent_predsample(
    hists,
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
    """Conditional draws of the SVC latent processes at x_stars
    (`pred_smoothness`/`pred_cov`, prediction.py:1057-1104).

    hists: (tilde_l_hist (S,N), uL_vecs_hist (S,N*T), ...).  Returns
    (tilde_l_stars (S, n_grid), L_f_stars (S, n_grid, M, M)) with the
    exp-diagonal transform applied (covariance process B* = L* L*ᵀ).
    """
    x = jnp.asarray(x)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    tl_h = jnp.asarray(hists[0])
    uL_h = jnp.asarray(hists[1])
    if n_sample is not None:
        tl_h, uL_h = tl_h[-n_sample:], uL_h[-n_sample:]
    N = x.shape[0]
    T = uL_h.shape[1] // N
    M = int((np.sqrt(8 * T + 1) - 1) / 2)
    S, G = tl_h.shape[0], x_stars.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), S * G * (T + 1)).reshape(
        S, G, T + 1, 2
    )

    @jax.jit
    def run():
        def per_draw(tl, uL, ks):
            U = uL.reshape(N, T)

            def point(xs, kk):
                a = _cond_gp_draw(
                    kk[0], tl, x, xs, mu_tilde_l, alpha_tilde_l, beta_tilde_l
                )
                u_star = jax.vmap(
                    lambda col, k: _cond_gp_draw(k, col, x, xs, mu_L, alpha_L, beta_L)
                )(U.T, kk[1:])
                L_star = vec_to_tril(uvec_to_lvec(u_star, M), M)
                return a, L_star

            return jax.vmap(point)(x_stars, ks)

        return jax.vmap(per_draw)(tl_h, uL_h, keys)

    a, L = run()
    return np.asarray(a), np.asarray(L)


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


# ---------------------------------------------------------------------------
# Hadamard plug-in MAP prediction (analytic, conditional-mean latents):
# point_predmap_hadamard (prediction.py:710-786), point_predmap_S_hadamard
# (:1661-1744), point_predmap_SVC_hadamard (:1367-1530).  Predicting all M
# tasks per x* subsumes the reference's `indexedpoint_*` variants — column m
# of the output IS the indexedpoint result for indx_star=m (the per-task
# predictive moments are marginal).
# ---------------------------------------------------------------------------


def _percentiles(mu_f, sigma2_y):
    sd = jnp.sqrt(sigma2_y)
    return jnp.stack([mu_f - 1.96 * sd, mu_f, mu_f + 1.96 * sd])


def snmgp_hadamard_predmap(
    map_draw,
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
):
    """Heterotopic SNMGP plug-in MAP prediction (`point_predmap_hadamard`,
    prediction.py:710-786).  Returns (3, n_grid, M)."""
    x = jnp.asarray(x)
    indx = jnp.asarray(indx)
    y = jnp.asarray(y)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    tilde_l, tilde_sigma, L_vec, ts2e = (jnp.asarray(v) for v in map_draw)
    M, N = num_tasks, x.shape[0]

    @jax.jit
    def run():
        L = vec_to_tril(L_vec, M)  # raw L_vec, like logpos.py:517
        B_f = L @ L.T
        l = jnp.exp(tilde_l)
        sig = jnp.exp(tilde_sigma)
        s2e = jnp.exp(ts2e)
        K_x = nonstationary_rbf(x, sigma1=sig, ell1=l) + MCMC_JITTER * jnp.eye(
            N, dtype=x.dtype
        )
        Smat = K_x * B_f[indx[:, None], indx[None, :]] + s2e * jnp.eye(N, dtype=x.dtype)
        chol_S = jnp.linalg.cholesky(Smat)
        alpha = jax.scipy.linalg.cho_solve((chol_S, True), y)

        def point(xs):
            ml, _ = _cond_gp_moments(
                tilde_l, x, xs, mu_tilde_l, alpha_tilde_l, beta_tilde_l
            )
            ms, _ = _cond_gp_moments(
                tilde_sigma, x, xs, mu_tilde_sigma, alpha_tilde_sigma, beta_tilde_sigma
            )
            l_star, s_star = jnp.exp(ml), jnp.exp(ms)
            k_x = nonstationary_rbf(
                x, xs[None], sigma1=sig, ell1=l, sigma2=s_star[None], ell2=l_star[None]
            )[:, 0]
            cross = k_x[:, None] * B_f[indx, :]
            mu_f = cross.T @ alpha
            V = jax.scipy.linalg.solve_triangular(chol_S, cross, lower=True)
            prior_var = jnp.diag(B_f) * (s_star**2)
            sigma2_y = jnp.maximum(prior_var - jnp.sum(V * V, axis=0) + s2e, PRECISION)
            return _percentiles(mu_f, sigma2_y)

        return jax.vmap(point, out_axes=1)(x_stars)

    return np.asarray(run())


def lmc_hadamard_predmap(map_draw, x, indx, y, num_tasks, x_stars):
    """Heterotopic stationary-LMC plug-in MAP prediction
    (`point_predmap_S_hadamard`, prediction.py:1661-1744).
    Returns (3, n_grid, M)."""
    x = jnp.asarray(x)
    indx = jnp.asarray(indx)
    y = jnp.asarray(y)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    tl, ts, L_vec, ts2e = (jnp.asarray(v) for v in map_draw)
    M, N = num_tasks, x.shape[0]

    @jax.jit
    def run():
        L = vec_to_tril(L_vec, M)
        B_f = L @ L.T
        l, sig, s2e = jnp.exp(tl), jnp.exp(ts), jnp.exp(ts2e)
        K_x = rbf(x, x, sig**2, l) + MCMC_JITTER * jnp.eye(N, dtype=x.dtype)
        Smat = K_x * B_f[indx[:, None], indx[None, :]] + s2e * jnp.eye(N, dtype=x.dtype)
        chol_S = jnp.linalg.cholesky(Smat)
        alpha = jax.scipy.linalg.cho_solve((chol_S, True), y)

        def point(xs):
            k_x = rbf(x, xs[None], sig**2, l)[:, 0]
            cross = k_x[:, None] * B_f[indx, :]
            mu_f = cross.T @ alpha
            V = jax.scipy.linalg.solve_triangular(chol_S, cross, lower=True)
            prior_var = jnp.diag(B_f) * (sig**2)
            sigma2_y = jnp.maximum(prior_var - jnp.sum(V * V, axis=0) + s2e, PRECISION)
            return _percentiles(mu_f, sigma2_y)

        return jax.vmap(point, out_axes=1)(x_stars)

    return np.asarray(run())


def svc_hadamard_predmap(
    map_draw,
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
):
    """Heterotopic SVC plug-in MAP prediction (`point_predmap_SVC_hadamard`,
    prediction.py:1367-1530).  Raw per-point Cholesky vecs like
    logpos_hadamard_SVC.  Returns (3, n_grid, M)."""
    x = jnp.asarray(x)
    indx = jnp.asarray(indx)
    y = jnp.asarray(y)
    x_stars = jnp.asarray(x_stars).reshape(-1)
    tilde_l, L_vecs, ts2e = (jnp.asarray(v) for v in map_draw)
    M, N = num_tasks, x.shape[0]
    T = tri_size(M)

    @jax.jit
    def run():
        U = L_vecs.reshape(N, T)
        L_f = vec_to_tril(U, M)  # (N, M, M) raw
        rows = L_f[jnp.arange(N), indx, :]  # (N, M)
        l = jnp.exp(tilde_l)
        s2e = jnp.exp(ts2e)
        K_x = nonstationary_rbf(x, ell1=l) + MCMC_JITTER * jnp.eye(N, dtype=x.dtype)
        Smat = K_x * (rows @ rows.T) + s2e * jnp.eye(N, dtype=x.dtype)
        chol_S = jnp.linalg.cholesky(Smat)
        alpha = jax.scipy.linalg.cho_solve((chol_S, True), y)

        def point(xs):
            ml, _ = _cond_gp_moments(
                tilde_l, x, xs, mu_tilde_l, alpha_tilde_l, beta_tilde_l
            )
            u_star = jax.vmap(
                lambda col: _cond_gp_moments(col, x, xs, mu_L, alpha_L, beta_L)[0]
            )(U.T)
            L_star = vec_to_tril(u_star, M)  # raw
            l_star = jnp.exp(ml)
            k_x = nonstationary_rbf(x, xs[None], ell1=l, ell2=l_star[None])[:, 0]
            cross = k_x[:, None] * (rows @ L_star.T)
            mu_f = cross.T @ alpha
            V = jax.scipy.linalg.solve_triangular(chol_S, cross, lower=True)
            prior_var = jnp.diag(L_star @ L_star.T) * nonstationary_rbf(
                xs[None], ell1=l_star[None]
            )[0, 0]
            sigma2_y = jnp.maximum(prior_var - jnp.sum(V * V, axis=0) + s2e, PRECISION)
            return _percentiles(mu_f, sigma2_y)

        return jax.vmap(point, out_axes=1)(x_stars)

    return np.asarray(run())


# ---------------------------------------------------------------------------
# Indexed-point variants: predict a SINGLE task per test location.
#
# The reference exposes these as separate functions
# (`indexedpoint_predsample_hadamard` prediction.py:585,
#  `indexedpoint_predmap_hadamard` :810,
#  `indexedpoint_predmap_SVC_hadamard` :1446,
#  `indexedpoint_predmap_S_hadamard` :1708).  Since the per-task predictive
# moments are marginal, task column m of the all-task prediction IS the
# indexedpoint result for indx_star=m; these wrappers gather that column so
# the reference API maps one-to-one.
# ---------------------------------------------------------------------------


def _gather_task_sample(out, indx_stars):
    # out: (n_grid, S, M) -> (n_grid, S)
    n = out.shape[0]
    return out[np.arange(n), :, np.asarray(indx_stars).reshape(-1)]


def _gather_task_map(out, indx_stars):
    # out: (3, n_grid, M) -> (3, n_grid)
    n = out.shape[1]
    return out[:, np.arange(n), np.asarray(indx_stars).reshape(-1)]


def snmgp_hadamard_indexedpoint_predsample(
    hists, x, indx, y, num_tasks, x_stars, indx_stars, **kw
):
    """Per-(x*, task*) SNMGP hadamard draws (`indexedpoint_predsample_hadamard`,
    prediction.py:585-677).  Returns (n_grid, S)."""
    out = snmgp_hadamard_predsample(hists, x, indx, y, num_tasks, x_stars, **kw)
    return _gather_task_sample(out, indx_stars)


def snmgp_hadamard_indexedpoint_predmap(
    map_draw, x, indx, y, num_tasks, x_stars, indx_stars, **kw
):
    """Per-(x*, task*) SNMGP hadamard plug-in MAP percentiles
    (`indexedpoint_predmap_hadamard`, prediction.py:810-886).
    Returns (3, n_grid)."""
    out = snmgp_hadamard_predmap(map_draw, x, indx, y, num_tasks, x_stars, **kw)
    return _gather_task_map(out, indx_stars)


def svc_hadamard_indexedpoint_predmap(
    map_draw, x, indx, y, num_tasks, x_stars, indx_stars, **kw
):
    """Per-(x*, task*) SVC hadamard plug-in MAP percentiles
    (`indexedpoint_predmap_SVC_hadamard`, prediction.py:1446-1514).
    Returns (3, n_grid)."""
    out = svc_hadamard_predmap(map_draw, x, indx, y, num_tasks, x_stars, **kw)
    return _gather_task_map(out, indx_stars)


def lmc_hadamard_indexedpoint_predmap(
    map_draw, x, indx, y, num_tasks, x_stars, indx_stars
):
    """Per-(x*, task*) stationary-LMC hadamard plug-in MAP percentiles
    (`indexedpoint_predmap_S_hadamard`, prediction.py:1708-1745).
    Returns (3, n_grid)."""
    out = lmc_hadamard_predmap(map_draw, x, indx, y, num_tasks, x_stars)
    return _gather_task_map(out, indx_stars)


def svc_hadamard_indexedpoint_predsample(
    hists, x, indx, y, num_tasks, x_stars, indx_stars, **kw
):
    """Per-(x*, task*) SVC hadamard posterior-sample draws.  The reference
    only ships the predmap form of this variant
    (`indexedpoint_predmap_SVC_hadamard`, prediction.py:1446-1514) — its
    predsample counterpart exists solely for SNMGP (:585) — but the
    column-gather construction extends uniformly, completing the
    {SNMGP, SVC, LMC} x {predsample, predmap} indexedpoint grid.
    Returns (n_grid, S)."""
    out = svc_hadamard_predsample(hists, x, indx, y, num_tasks, x_stars, **kw)
    return _gather_task_sample(out, indx_stars)


def lmc_hadamard_indexedpoint_predsample(
    hists, x, indx, y, num_tasks, x_stars, indx_stars, **kw
):
    """Per-(x*, task*) stationary-LMC hadamard posterior-sample draws (no
    reference counterpart — see `svc_hadamard_indexedpoint_predsample`).
    Returns (n_grid, S)."""
    out = lmc_hadamard_predsample(hists, x, indx, y, num_tasks, x_stars, **kw)
    return _gather_task_sample(out, indx_stars)
