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
    lmc_hadamard_predmap,
    lmc_hadamard_predsample,
    lmc_predmap,
    lmc_predsample,
    snmgp_predmap,
    snmgp_predsample,
    svc_latent_predsample,
    svc_predmap,
    svc_predmap_sampling,
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


def test_snmgp_predmap_matches_dense_oracle():
    """Plug-in MAP prediction is closed-form: with a tiny latent-prior
    amplitude the conditional means at x* collapse to the prior means, and
    the (3, G, M) percentile stack must match the dense-NumPy predictive."""
    x = np.sort(RNG.random(N))
    Y = RNG.standard_normal((N, M))
    tilde_l = np.full(N, -1.0)
    tilde_sigma = np.full(N, 0.2)
    uL = 0.3 * RNG.standard_normal(T)
    ts2e = -1.5
    x_star = np.array([0.37])
    mu_l, mu_s = -1.0, 0.2

    out = snmgp_predmap(
        (tilde_l, tilde_sigma, uL, ts2e),
        Y,
        x,
        x_star,
        mu_tilde_l=mu_l,
        alpha_tilde_l=1e-3,
        beta_tilde_l=1.0,
        mu_tilde_sigma=mu_s,
        alpha_tilde_sigma=1e-3,
        beta_tilde_sigma=1.0,
    )  # (3, 1, M)
    assert out.shape == (3, 1, M)

    jit = 1e-6
    L = _tril_np(_uvec_np(uL, M), M)
    B_f = L @ L.T
    l = np.exp(tilde_l)
    s = np.exp(tilde_sigma)
    K_x = _gibbs_np(x, l, s) + jit * np.eye(N)
    S_tr = np.kron(B_f, K_x) + np.exp(ts2e) * np.eye(N * M)
    l_star = np.array([np.exp(mu_l)])
    s_star = np.array([np.exp(mu_s)])
    k_x = _gibbs_np(x, l, s, x_star, l_star, s_star)
    k_f = np.kron(B_f, k_x)
    y = Y.T.reshape(-1)
    iS = np.linalg.inv(S_tr)
    mu_star = k_f.T @ iS @ y
    prior = np.diag(B_f) * float(_gibbs_np(x_star, l_star, s_star)[0, 0])
    var_star = prior - np.diag(k_f.T @ iS @ k_f) + np.exp(ts2e)

    np.testing.assert_allclose(out[1, 0], mu_star, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        out[2, 0], mu_star + 1.96 * np.sqrt(var_star), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        out[0, 0], mu_star - 1.96 * np.sqrt(var_star), rtol=1e-5, atol=1e-8
    )


def test_svc_predmap_agrees_with_sampling_at_train_point():
    """At x* = a training input the latent conditionals are (near-)degenerate,
    so plug-in means and MC means of predmap_sampling must agree."""
    x = np.sort(RNG.random(N))
    Y = RNG.standard_normal((N, M))
    tilde_l = -1.0 + 0.1 * RNG.standard_normal(N)
    uL_vecs = np.tile(0.2 * RNG.standard_normal(T), N) + 0.02 * RNG.standard_normal(
        N * T
    )
    map_draw = (tilde_l, uL_vecs, -1.5)
    x_star = np.array([x[4]])

    # beta=0.1 keeps the latent-prior gram well conditioned so the
    # conditional at a train point is actually degenerate
    hyp = dict(beta_tilde_l=0.1, beta_L=0.1)
    plug = svc_predmap(map_draw, Y, x, x_star, **hyp)  # (3, 1, M)
    draws = svc_predmap_sampling(600, map_draw, Y, x, x_star, seed=1, **hyp)
    emp_mu = draws[0].mean(axis=0)
    # residual gap: jitter keeps the conditional sd slightly above 0 at the
    # train point, and exp(u*) biases the MC mean relative to plug-in
    np.testing.assert_allclose(plug[1, 0], emp_mu, atol=0.08)
    # band ordering sanity
    assert np.all(plug[0] < plug[1]) and np.all(plug[1] < plug[2])


def test_svc_latent_predsample_interpolates_train_values():
    """Conditional latent draws at a training input reproduce the stored
    latent values (conditioning collapses there): pred_smoothness/pred_cov
    parity, reference prediction.py:1057-1104."""
    x = np.sort(RNG.random(N))
    tilde_l = -1.0 + 0.3 * RNG.standard_normal(N)
    uL_vecs = 0.2 * RNG.standard_normal(N * T)
    S_draws = 50
    hists = (
        np.tile(tilde_l, (S_draws, 1)),
        np.tile(uL_vecs, (S_draws, 1)),
    )
    k = 3
    tl_stars, L_stars = svc_latent_predsample(
        hists,
        x,
        np.array([x[k]]),
        alpha_tilde_l=1.0,
        beta_tilde_l=0.1,
        alpha_L=1.0,
        beta_L=0.1,
        seed=0,
    )
    assert tl_stars.shape == (S_draws, 1)
    assert L_stars.shape == (S_draws, 1, M, M)
    # PRECISION floors the conditional sd at 1e-3, so spread stays tiny
    np.testing.assert_allclose(tl_stars.mean(), tilde_l[k], atol=0.02)
    U_k = uL_vecs.reshape(N, T)[k]
    expected_L = _tril_np(_uvec_np(U_k, M), M)
    np.testing.assert_allclose(
        L_stars.mean(axis=0)[0], expected_L, atol=0.02
    )


def test_lmc_hadamard_predmap_matches_sampling_mean():
    Nn = 30
    x = np.sort(RNG.random(Nn))
    indx = RNG.integers(0, M, Nn)
    f = np.sin(2 * np.pi * x)
    y = np.where(indx == 0, f, 0.7 * f) + 0.05 * RNG.standard_normal(Nn)
    uL = np.array([0.0, 0.7, np.log(0.3)])
    draw = (np.log(0.25), 0.0, uL, np.log(0.05**2))
    x_stars = np.array([0.4, 0.6])

    plug = lmc_hadamard_predmap(draw, x, indx, y, M, x_stars)  # (3, 2, M)
    S_draws = 500
    hists = tuple(np.tile(np.asarray(v), (S_draws,) + (1,) * np.ndim(v)) for v in draw)
    samp = lmc_hadamard_predsample(hists, x, indx, y, M, x_stars, seed=2)
    np.testing.assert_allclose(plug[1], samp.mean(axis=1), atol=0.05)
    # indexedpoint subsumption: column m is the single-task prediction
    assert plug[1].shape == (2, M)


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


def test_snmgp_and_svc_hadamard_predmap_sane():
    """Heterotopic plug-in predmaps: finite, ordered bands, and the plug-in
    mean tracks the hadamard predsample MC mean at moderate tolerance."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.prediction import (
        snmgp_hadamard_predmap,
        snmgp_hadamard_predsample,
        svc_hadamard_predmap,
        svc_hadamard_predsample,
    )

    Nn = 24
    x = np.sort(RNG.random(Nn))
    indx = RNG.integers(0, M, Nn)
    f = np.sin(2 * np.pi * x)
    y = np.where(indx == 0, f, 0.6 * f) + 0.05 * RNG.standard_normal(Nn)

    # SNMGP hadamard: raw L_vec (logpos.py:517), latent fields at the data
    tl = np.full(Nn, np.log(0.25))
    ts = np.zeros(Nn)
    L_vec = np.array([1.0, 0.6, 0.3])
    draw = (tl, ts, L_vec, np.log(0.05**2))
    x_stars = np.array([0.45, 0.55])
    hyp = dict(beta_tilde_l=0.1, beta_tilde_sigma=0.1)
    plug = snmgp_hadamard_predmap(draw, x, indx, y, M, x_stars, **hyp)
    assert plug.shape == (3, 2, M) and np.all(np.isfinite(plug))
    assert np.all(plug[0] < plug[1]) and np.all(plug[1] < plug[2])
    S_draws = 400
    hists = tuple(np.tile(np.asarray(v), (S_draws,) + (1,) * np.ndim(v)) for v in draw)
    samp = snmgp_hadamard_predsample(hists, x, indx, y, M, x_stars, seed=3, **hyp)
    np.testing.assert_allclose(plug[1], samp.mean(axis=1), atol=0.12)

    # SVC hadamard: per-point raw Cholesky vecs
    T_ = T
    L_vecs = np.tile(L_vec, Nn) + 0.01 * RNG.standard_normal(Nn * T_)
    draw_svc = (tl, L_vecs, np.log(0.05**2))
    hyp_svc = dict(beta_tilde_l=0.1, beta_L=0.1)
    plug2 = svc_hadamard_predmap(draw_svc, x, indx, y, M, x_stars, **hyp_svc)
    assert plug2.shape == (3, 2, M) and np.all(np.isfinite(plug2))
    assert np.all(plug2[0] < plug2[1]) and np.all(plug2[1] < plug2[2])
    hists2 = tuple(
        np.tile(np.asarray(v), (S_draws,) + (1,) * np.ndim(v)) for v in draw_svc
    )
    samp2 = svc_hadamard_predsample(hists2, x, indx, y, M, x_stars, seed=4, **hyp_svc)
    np.testing.assert_allclose(plug2[1], samp2.mean(axis=1), atol=0.12)


def test_indexedpoint_wrappers_gather_task_columns():
    """The indexedpoint_* wrappers must equal column indx_star of the
    all-task prediction (reference indexedpoint_predmap_hadamard etc.)."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.prediction import (
        lmc_hadamard_indexedpoint_predmap,
        snmgp_hadamard_indexedpoint_predmap,
        snmgp_hadamard_indexedpoint_predsample,
        snmgp_hadamard_predmap,
        snmgp_hadamard_predsample,
        svc_hadamard_indexedpoint_predmap,
        svc_hadamard_predmap,
    )

    Nn = 20
    x = np.sort(RNG.random(Nn))
    indx = RNG.integers(0, M, Nn)
    f = np.sin(2 * np.pi * x)
    y = np.where(indx == 0, f, 0.6 * f) + 0.05 * RNG.standard_normal(Nn)
    x_stars = np.array([0.3, 0.7])
    indx_stars = np.array([1, 0])

    tl = np.full(Nn, np.log(0.25))
    ts = np.zeros(Nn)
    L_vec = np.array([1.0, 0.6, 0.3])
    draw = (tl, ts, L_vec, np.log(0.05**2))
    hyp = dict(beta_tilde_l=0.1, beta_tilde_sigma=0.1)

    full = snmgp_hadamard_predmap(draw, x, indx, y, M, x_stars, **hyp)
    sel = snmgp_hadamard_indexedpoint_predmap(
        draw, x, indx, y, M, x_stars, indx_stars, **hyp
    )
    assert sel.shape == (3, 2)
    np.testing.assert_allclose(sel[:, 0], full[:, 0, 1])
    np.testing.assert_allclose(sel[:, 1], full[:, 1, 0])

    S_draws = 8
    hists = tuple(np.tile(np.asarray(v), (S_draws,) + (1,) * np.ndim(v)) for v in draw)
    fs = snmgp_hadamard_predsample(hists, x, indx, y, M, x_stars, seed=5, **hyp)
    ss = snmgp_hadamard_indexedpoint_predsample(
        hists, x, indx, y, M, x_stars, indx_stars, seed=5, **hyp
    )
    assert ss.shape == (2, S_draws)
    np.testing.assert_allclose(ss[0], fs[0, :, 1])
    np.testing.assert_allclose(ss[1], fs[1, :, 0])

    L_vecs = np.tile(L_vec, Nn)
    draw_svc = (tl, L_vecs, np.log(0.05**2))
    hyp_svc = dict(beta_tilde_l=0.1, beta_L=0.1)
    full2 = svc_hadamard_predmap(draw_svc, x, indx, y, M, x_stars, **hyp_svc)
    sel2 = svc_hadamard_indexedpoint_predmap(
        draw_svc, x, indx, y, M, x_stars, indx_stars, **hyp_svc
    )
    np.testing.assert_allclose(sel2[:, 0], full2[:, 0, 1])

    uL = np.array([0.0, 0.7, np.log(0.3)])
    draw_lmc = (np.log(0.25), 0.0, uL, np.log(0.05**2))
    full3 = lmc_hadamard_predmap(draw_lmc, x, indx, y, M, x_stars)
    sel3 = lmc_hadamard_indexedpoint_predmap(
        draw_lmc, x, indx, y, M, x_stars, indx_stars
    )
    np.testing.assert_allclose(sel3[:, 1], full3[:, 1, 0])


def test_indexedpoint_predsample_svc_lmc_variants():
    """Round-5 completion of the indexedpoint grid: the SVC/LMC hadamard
    predsample wrappers gather the matching task column of the all-task
    draws (the reference only ships the SNMGP predsample form, its SVC/LMC
    indexedpoint API stops at predmap — prediction.py:585,1446,1708)."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.prediction import (
        lmc_hadamard_indexedpoint_predsample,
        lmc_hadamard_predsample,
        svc_hadamard_indexedpoint_predsample,
        svc_hadamard_predsample,
    )

    Nn = 18
    x = np.sort(RNG.random(Nn))
    indx = RNG.integers(0, M, Nn)
    f = np.cos(2 * np.pi * x)
    y = np.where(indx == 0, f, 0.5 * f) + 0.05 * RNG.standard_normal(Nn)
    x_stars = np.array([0.25, 0.6])
    indx_stars = np.array([1, 0])
    S_draws = 6

    tl = np.full(Nn, np.log(0.25))
    L_vecs = np.tile(np.array([1.0, 0.5, 0.4]), Nn)
    draw_svc = (tl, L_vecs, np.log(0.05**2))
    hists_svc = tuple(
        np.tile(np.asarray(v), (S_draws,) + (1,) * np.ndim(v)) for v in draw_svc
    )
    hyp_svc = dict(beta_tilde_l=0.1, beta_L=0.1)
    full = svc_hadamard_predsample(hists_svc, x, indx, y, M, x_stars, seed=3, **hyp_svc)
    sel = svc_hadamard_indexedpoint_predsample(
        hists_svc, x, indx, y, M, x_stars, indx_stars, seed=3, **hyp_svc
    )
    assert sel.shape == (2, S_draws)
    np.testing.assert_allclose(sel[0], full[0, :, 1])
    np.testing.assert_allclose(sel[1], full[1, :, 0])

    uL = np.array([0.0, 0.6, np.log(0.4)])
    draw_lmc = (np.log(0.25), 0.0, uL, np.log(0.05**2))
    hists_lmc = tuple(
        np.tile(np.asarray(v), (S_draws,) + (1,) * np.ndim(v)) for v in draw_lmc
    )
    full2 = lmc_hadamard_predsample(hists_lmc, x, indx, y, M, x_stars, seed=4)
    sel2 = lmc_hadamard_indexedpoint_predsample(
        hists_lmc, x, indx, y, M, x_stars, indx_stars, seed=4
    )
    assert sel2.shape == (2, S_draws)
    np.testing.assert_allclose(sel2[0], full2[0, :, 1])
    np.testing.assert_allclose(sel2[1], full2[1, :, 0])
