"""Log-posterior library vs independent NumPy/SciPy oracles.

The oracle builds each model's covariance and priors from the math in
SURVEY.md §0.1 directly with numpy/scipy — a redundant implementation in the
reference's own oracle idiom (SURVEY.md §4.2).
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import invgamma, multivariate_normal, norm

from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import (
    logdensities as ld,
)

RNG = np.random.default_rng(3)
N, M = 7, 2
T = ld.tri_size(M)
JIT = 1e-6  # MCMC jitter in config


def _gibbs_np(x, ell, sigma=None):
    d2 = (x[:, None] - x[None, :]) ** 2
    denom = ell[:, None] ** 2 + ell[None, :] ** 2
    pref = np.sqrt(2 * ell[:, None] * ell[None, :] / denom)
    K = pref * np.exp(-d2 / denom)
    if sigma is not None:
        K = sigma[:, None] * sigma[None, :] * K
    return K


def _rbf_np(x, alpha, beta):
    d2 = (x[:, None] - x[None, :]) ** 2
    return alpha**2 * np.exp(-0.5 * d2 / beta**2)


def _tril_np(v, m):
    L = np.zeros((m, m))
    L[np.tril_indices(m)] = v
    return L


def _uvec_np(u, m):
    v = u.copy()
    didx = np.cumsum(np.arange(1, m + 1)) - 1
    v[didx] = np.exp(u[didx])
    return v


def make_data():
    x = np.sort(RNG.random(N))
    Y = RNG.standard_normal((N, M))
    return x, Y


def test_snmgp_log_posterior_vs_oracle():
    x, Y = make_data()
    tilde_l = 0.3 * RNG.standard_normal(N) - 1
    tilde_sigma = 0.3 * RNG.standard_normal(N)
    uL = 0.3 * RNG.standard_normal(T)
    ts2e = -1.0
    pars = np.concatenate([tilde_l, tilde_sigma, uL, [ts2e]])

    got = float(ld.snmgp_log_posterior(jnp.asarray(pars), jnp.asarray(Y), jnp.asarray(x)))

    # oracle
    L = _tril_np(_uvec_np(uL, M), M)
    B_f = L @ L.T
    K_x = _gibbs_np(x, np.exp(tilde_l), np.exp(tilde_sigma)) + JIT * np.eye(N)
    S = np.kron(B_f, K_x) + np.exp(ts2e) * np.eye(N * M)
    y = Y.T.reshape(-1)
    loglik = multivariate_normal.logpdf(y, cov=S) + 0.5 * N * M * np.log(2 * np.pi)
    prior = multivariate_normal.logpdf(
        tilde_l, mean=np.zeros(N), cov=_rbf_np(x, 1.0, 1.0) + JIT * np.eye(N)
    )
    prior += multivariate_normal.logpdf(
        tilde_sigma, mean=np.zeros(N), cov=_rbf_np(x, 1.0, 1.0) + JIT * np.eye(N)
    )
    prior += norm.logpdf(uL, scale=10.0).sum()
    prior += invgamma.logpdf(np.exp(ts2e), a=1.0, scale=1.0) + ts2e
    np.testing.assert_allclose(got, loglik + prior, rtol=1e-7)


def test_svc_log_posterior_vs_oracle():
    x, Y = make_data()
    tilde_l = 0.2 * RNG.standard_normal(N) - 1
    uL_vecs = 0.3 * RNG.standard_normal(N * T)
    ts2e = -1.5
    pars = np.concatenate([tilde_l, uL_vecs, [ts2e]])
    got = float(ld.svc_log_posterior(jnp.asarray(pars), jnp.asarray(Y), jnp.asarray(x)))

    # oracle: K[(i,n),(j,m)] = K_x[n,m] <L_f[n,i,:], L_f[m,j,:]>
    L_f = np.stack([_tril_np(_uvec_np(uL_vecs[n * T : (n + 1) * T], M), M) for n in range(N)])
    K_x = _gibbs_np(x, np.exp(tilde_l)) + JIT * np.eye(N)
    K = np.zeros((M * N, M * N))
    for i in range(M):
        for j in range(M):
            for n in range(N):
                for m in range(N):
                    K[i * N + n, j * N + m] = K_x[n, m] * L_f[n, i] @ L_f[m, j]
    S = K + np.exp(ts2e) * np.eye(N * M)
    y = Y.T.reshape(-1)
    loglik = multivariate_normal.logpdf(y, cov=S) + 0.5 * N * M * np.log(2 * np.pi)
    # prior jitter scales with alpha^2 (logdensities._prior_jitter)
    prior = multivariate_normal.logpdf(
        tilde_l, mean=np.zeros(N), cov=_rbf_np(x, 5.0, 1.0) + 25 * JIT * np.eye(N)
    )
    U = uL_vecs.reshape(N, T)
    SL = _rbf_np(x, 5.0, 1.0) + 25 * JIT * np.eye(N)
    for t in range(T):
        prior += multivariate_normal.logpdf(U[:, t], mean=np.zeros(N), cov=SL)
    prior += invgamma.logpdf(np.exp(ts2e), a=1.0, scale=1.0) + ts2e
    np.testing.assert_allclose(got, loglik + prior, rtol=1e-7)


def test_lmc_log_posterior_vs_oracle():
    x, Y = make_data()
    tl, ts = -0.5, 0.2
    uL = 0.3 * RNG.standard_normal(T)
    ts2e = -1.0
    pars = np.concatenate([[tl, ts], uL, [ts2e]])
    got = float(ld.lmc_log_posterior(jnp.asarray(pars), jnp.asarray(Y), jnp.asarray(x)))

    L = _tril_np(_uvec_np(uL, M), M)
    B_f = L @ L.T
    ell = np.exp(tl) * np.ones(N)
    sig = np.exp(ts) * np.ones(N)
    K_x = _gibbs_np(x, ell, sig) + JIT * np.eye(N)
    S = np.kron(B_f, K_x) + np.exp(ts2e) * np.eye(N * M)
    y = Y.T.reshape(-1)
    loglik = multivariate_normal.logpdf(y, cov=S) + 0.5 * N * M * np.log(2 * np.pi)
    prior = norm.logpdf(tl, 0.0, 1.0)
    prior += norm.logpdf(uL, scale=10.0).sum()
    prior += invgamma.logpdf(np.exp(ts2e), a=1.0, scale=1.0) + ts2e
    np.testing.assert_allclose(got, loglik + prior, rtol=1e-7)


def test_hadamard_snmgp_vs_oracle():
    x, Y = make_data()
    indx = np.asarray(RNG.integers(0, M, N), np.int32)
    y = Y[np.arange(N), indx]
    tilde_l = 0.2 * RNG.standard_normal(N) - 1
    tilde_sigma = 0.2 * RNG.standard_normal(N)
    L_vec = 0.5 + 0.2 * RNG.standard_normal(T)
    ts2e = -1.0
    pars = np.concatenate([tilde_l, tilde_sigma, L_vec, [ts2e]])
    got = float(
        ld.snmgp_hadamard_log_posterior(
            jnp.asarray(pars), jnp.asarray(x), jnp.asarray(indx), jnp.asarray(y), M
        )
    )
    # oracle (raw L_vec — hadamard variant uses no exp-diag transform)
    L = _tril_np(L_vec, M)
    B_f = L @ L.T
    K_x = _gibbs_np(x, np.exp(tilde_l), np.exp(tilde_sigma)) + JIT * np.eye(N)
    K = K_x * B_f[indx[:, None], indx[None, :]]
    S = K + np.exp(ts2e) * np.eye(N)
    loglik = multivariate_normal.logpdf(y, cov=S) + 0.5 * N * np.log(2 * np.pi)
    prior = multivariate_normal.logpdf(
        tilde_l, mean=np.zeros(N), cov=_rbf_np(x, 1.0, 1.0) + JIT * np.eye(N)
    )
    prior += multivariate_normal.logpdf(
        tilde_sigma, mean=np.zeros(N), cov=_rbf_np(x, 1.0, 1.0) + JIT * np.eye(N)
    )
    prior += norm.logpdf(L_vec, scale=10.0).sum()
    # hadamard uses the un-normalized invgamma (logpos.py:555)
    s2e = np.exp(ts2e)
    prior += (-1.0 - 1.0) * ts2e - 1.0 / s2e
    prior += ts2e
    np.testing.assert_allclose(got, loglik + prior, rtol=1e-7)


def test_gradients_exist_and_finite():
    x, Y = make_data()
    dim = 2 * N + T + 1
    pars = jnp.asarray(0.1 * RNG.standard_normal(dim))
    g = jax.jit(jax.grad(lambda p: ld.snmgp_log_posterior(p, jnp.asarray(Y), jnp.asarray(x))))(
        pars
    )
    assert np.all(np.isfinite(np.asarray(g)))
    dim_svc = N + N * T + 1
    pars2 = jnp.asarray(0.1 * RNG.standard_normal(dim_svc))
    g2 = jax.jit(jax.grad(lambda p: ld.svc_log_posterior(p, jnp.asarray(Y), jnp.asarray(x))))(
        pars2
    )
    assert np.all(np.isfinite(np.asarray(g2)))


def test_snmgp_deviance_matches_loglik():
    x, Y = make_data()
    tilde_l = 0.2 * RNG.standard_normal(N)
    tilde_sigma = 0.2 * RNG.standard_normal(N)
    L_vec = 0.5 + 0.2 * RNG.standard_normal(T)  # deviance uses raw L_vec
    ts2e = -1.0
    pars = np.concatenate([tilde_l, tilde_sigma, L_vec, [ts2e]])
    dev = float(ld.snmgp_deviance(jnp.asarray(pars), jnp.asarray(Y), jnp.asarray(x)))
    L = _tril_np(L_vec, M)
    B_f = L @ L.T
    K_x = _gibbs_np(x, np.exp(tilde_l), np.exp(tilde_sigma)) + JIT * np.eye(N)
    S = np.kron(B_f, K_x) + np.exp(ts2e) * np.eye(N * M)
    y = Y.T.reshape(-1)
    ll = multivariate_normal.logpdf(y, cov=S) + 0.5 * N * M * np.log(2 * np.pi)
    np.testing.assert_allclose(dev, -2 * ll, rtol=1e-7)


def test_show_covs_components():
    """snmgp_covs / snmgp_hadamard_covs (reference show_covs*,
    logpos.py:140-173): raw L_vec -> B_f = L Lᵀ, nonstationary K_x."""
    RNGL = np.random.default_rng(104)
    x, Y = make_data()
    tilde_l = 0.2 * RNGL.standard_normal(N)
    tilde_sigma = 0.2 * RNGL.standard_normal(N)
    L_vec = 0.5 + 0.2 * RNGL.standard_normal(T)
    pars = jnp.asarray(np.concatenate([tilde_l, tilde_sigma, L_vec, [-1.0]]))
    covs = ld.snmgp_covs(pars, jnp.asarray(Y), jnp.asarray(x))
    L = _tril_np(L_vec, M)
    np.testing.assert_allclose(covs["B_f"], L @ L.T, rtol=1e-6)
    np.testing.assert_allclose(
        covs["K_x"], _gibbs_np(x, np.exp(tilde_l), np.exp(tilde_sigma)), rtol=1e-5
    )
    np.testing.assert_allclose(float(covs["sigma2_err"]), np.exp(-1.0), rtol=1e-6)

    indx = jnp.asarray(np.arange(N) % M)
    covs_h = ld.snmgp_hadamard_covs(pars, jnp.asarray(x), indx)
    np.testing.assert_allclose(covs_h["B_f"], L @ L.T, rtol=1e-6)
    assert "K_x" not in covs_h


def test_profiling_utils():
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.profiling import (
        PhaseTimer,
        device_memory_stats,
        print_mem,
        rss_mb,
    )

    t = PhaseTimer()
    with t.phase("alpha"):
        sum(range(1000))
    with t.phase("alpha"):
        pass
    with t.phase("beta"):
        pass
    assert t.counts["alpha"] == 2 and t.counts["beta"] == 1
    rep = t.report()
    assert "alpha" in rep and "beta" in rep
    assert rss_mb() > 10.0
    assert print_mem(3) > 10.0
    assert isinstance(device_memory_stats(), dict)
