"""MCMC posterior-prediction library vs dense NumPy oracles.

Strategy: with near-zero prior amplitude for the latent processes at x*,
their conditional draws are deterministic (variance floors at PRECISION),
so the predictive p(y* | y, draw) is exactly Gaussian with a closed form
computable densely in NumPy — the empirical moments of many vmapped draws
must match.
"""

import numpy as np
import jax
import jax.numpy as jnp

from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import (
    logdensities as ld,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.prediction import (
    lmc_predsample,
    snmgp_predsample,
    svc_predsample,
)

RNG = np.random.default_rng(8)
N, M = 10, 2
T = ld.tri_size(M)


def _gibbs_np(x1, e1, s1, x2=None, e2=None, s2=None):
    if x2 is None:
        x2, e2, s2 = x1, e1, s1
    d2 = (x1[:, None] - x2[None, :]) ** 2
    denom = e1[:, None] ** 2 + e2[None, :] ** 2
    pref = np.sqrt(2 * e1[:, None] * e2[None, :] / denom)
    return s1[:, None] * s2[None, :] * pref * np.exp(-d2 / denom)


def _uvec_np(u, m):
    v = np.array(u, dtype=float)
    didx = np.cumsum(np.arange(1, m + 1)) - 1
    v[didx] = np.exp(u[didx])
    return v


def _tril_np(v, m):
    L = np.zeros((m, m))
    L[np.tril_indices(m)] = v
    return L


def test_snmgp_predsample_moments_vs_oracle():
    x = np.sort(RNG.random(N))
    Y = RNG.standard_normal((N, M))
    tilde_l = np.full(N, -1.0)
    tilde_sigma = np.full(N, 0.2)
    uL = 0.3 * RNG.standard_normal(T)
    ts2e = -1.5
    x_star = np.array([0.37])
    S_draws = 4000

    # tiny prior amplitude => latent draws at x* collapse to the prior mean
    mu_l, mu_s = -1.0, 0.2
    hists = (
        np.tile(tilde_l, (S_draws, 1)),
        np.tile(tilde_sigma, (S_draws, 1)),
        np.tile(uL, (S_draws, 1)),
        np.full(S_draws, ts2e),
    )
    out = snmgp_predsample(
        hists,
        Y,
        x,
        x_star,
        mu_tilde_l=mu_l,
        alpha_tilde_l=1e-3,
        beta_tilde_l=1.0,
        mu_tilde_sigma=mu_s,
        alpha_tilde_sigma=1e-3,
        beta_tilde_sigma=1.0,
        seed=0,
    )  # (1, S, M)
    draws = out[0]

    # oracle: dense GP predictive with l* = exp(mu_l), s* = exp(mu_s)
    jit = 1e-6
    L = _tril_np(_uvec_np(uL, M), M)
    B_f = L @ L.T
    l = np.exp(tilde_l)
    s = np.exp(tilde_sigma)
    K_x = _gibbs_np(x, l, s) + jit * np.eye(N)
    S_tr = np.kron(B_f, K_x) + np.exp(ts2e) * np.eye(N * M)
    l_star = np.array([np.exp(mu_l)])
    s_star = np.array([np.exp(mu_s)])
    k_x = _gibbs_np(x, l, s, x_star, l_star, s_star)  # (N, 1)
    k_f = np.kron(B_f, k_x)  # (NM, M)
    y = Y.T.reshape(-1)
    iS = np.linalg.inv(S_tr)
    mu_star = k_f.T @ iS @ y
    prior = np.diag(B_f) * float(_gibbs_np(x_star, l_star, s_star)[0, 0])
    var_star = prior - np.diag(k_f.T @ iS @ k_f) + np.exp(ts2e)

    emp_mu = draws.mean(axis=0)
    emp_var = draws.var(axis=0)
    np.testing.assert_allclose(emp_mu, mu_star, atol=4 * np.sqrt(var_star / S_draws).max())
    np.testing.assert_allclose(emp_var, var_star, rtol=0.15)


def test_svc_predsample_runs_and_is_sane():
    x = np.sort(RNG.random(N))
    Y = RNG.standard_normal((N, M))
    S_draws = 200
    tilde_l = np.full(N, -1.0)
    uL_vecs = np.tile(_lvec_init(), N)
    hists = (
        np.tile(tilde_l, (S_draws, 1)) + 0.01 * RNG.standard_normal((S_draws, N)),
        np.tile(uL_vecs, (S_draws, 1)),
        np.full(S_draws, -1.5),
    )
    out = svc_predsample(hists, Y, x, np.array([0.3, 0.7]), seed=0)
    assert out.shape == (2, S_draws, M)
    assert np.all(np.isfinite(out))
    assert np.abs(out.mean()) < 5.0


def _lvec_init():
    u = 0.2 * RNG.standard_normal(T)
    return u


def test_lmc_predsample_recovers_signal():
    """Stationary LMC predictive should interpolate a smooth shared signal."""
    Nn = 25
    x = np.linspace(0, 1, Nn)
    f = np.sin(2 * np.pi * x)
    Y = np.stack([f, 0.8 * f], axis=1) + 0.05 * RNG.standard_normal((Nn, M))
    S_draws = 300
    # draw matching the generating process: l ~ 0.25, sigma ~ 1, B ~ [[1,.8],[.8,.64+d]]
    uL = np.array([0.0, 0.8, np.log(0.3)])  # L = [[1,0],[.8,.3]]
    hists = (
        np.full(S_draws, np.log(0.25)),
        np.full(S_draws, 0.0),
        np.tile(uL, (S_draws, 1)),
        np.full(S_draws, np.log(0.05**2)),
    )
    x_stars = np.array([0.25, 0.5])
    out = lmc_predsample(hists, Y, x, x_stars, seed=0)  # (2, S, M)
    mean = out.mean(axis=1)
    true = np.stack(
        [[np.sin(2 * np.pi * 0.25), 0.8 * np.sin(2 * np.pi * 0.25)],
         [np.sin(2 * np.pi * 0.5), 0.8 * np.sin(2 * np.pi * 0.5)]]
    )
    np.testing.assert_allclose(mean, true, atol=0.15)
