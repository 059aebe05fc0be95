"""Whitened parameterizations: consistency with the centered densities.

The whitened log posterior must equal the centered log posterior at the
transformed parameters up to a constant (the prior-Cholesky log-det),
uniformly over eta — otherwise the two parameterizations target different
posteriors.
"""

import numpy as np
import jax.numpy as jnp

from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import (
    logdensities as ld,
)

RNG = np.random.default_rng(6)
N, M = 8, 2
T = ld.tri_size(M)


def _data():
    x = jnp.asarray(np.sort(RNG.random(N)))
    Y = jnp.asarray(RNG.standard_normal((N, M)))
    return x, Y


def test_svc_whitened_matches_centered_up_to_constant():
    x, Y = _data()
    hyp = dict(mu_tilde_l=-1.0, alpha_tilde_l=3.0, beta_tilde_l=0.4,
               mu_L=0.2, alpha_L=5.0, beta_L=1.0, a=1.0, b=1.0)
    chol_l, chol_L = ld.svc_whiten_chols(
        x, hyp["alpha_tilde_l"], hyp["beta_tilde_l"], hyp["alpha_L"], hyp["beta_L"]
    )
    dim = N + N * T + 1
    diffs = []
    for _ in range(4):
        eta = jnp.asarray(0.5 * RNG.standard_normal(dim))
        lw = float(
            ld.svc_log_posterior_whitened(
                eta, Y, x, chol_l, chol_L,
                mu_tilde_l=hyp["mu_tilde_l"], mu_L=hyp["mu_L"], a=hyp["a"], b=hyp["b"],
            )
        )
        p = ld.svc_unwhiten(eta, x, hyp["mu_tilde_l"], hyp["mu_L"], chol_l, chol_L, M)
        # centered takes unconstrained uL (it applies exp-diag itself); the
        # whitened path treats the transformed U as the *unconstrained* vec
        pars_c = jnp.concatenate(
            [p.tilde_l, p.uL_vecs, jnp.reshape(p.tilde_sigma2_err, (1,))]
        )
        lc = float(ld.svc_log_posterior(pars_c, Y, x, **hyp))
        diffs.append(lw - lc)
    diffs = np.array(diffs)
    np.testing.assert_allclose(diffs, diffs[0], atol=1e-6)


def test_snmgp_whitened_matches_centered_up_to_constant():
    x, Y = _data()
    hyp = dict(mu_tilde_l=-0.5, alpha_tilde_l=2.0, beta_tilde_l=0.5,
               mu_tilde_sigma=0.1, alpha_tilde_sigma=1.5, beta_tilde_sigma=0.7,
               a=1.0, b=1.0, c=10.0)
    chol_l, chol_s = ld.snmgp_whiten_chols(
        x, hyp["alpha_tilde_l"], hyp["beta_tilde_l"],
        hyp["alpha_tilde_sigma"], hyp["beta_tilde_sigma"],
    )
    dim = 2 * N + T + 1
    diffs = []
    for _ in range(4):
        eta = jnp.asarray(0.5 * RNG.standard_normal(dim))
        lw = float(
            ld.snmgp_log_posterior_whitened(
                eta, Y, x, chol_l, chol_s,
                mu_tilde_l=hyp["mu_tilde_l"], mu_tilde_sigma=hyp["mu_tilde_sigma"],
                a=hyp["a"], b=hyp["b"], c=hyp["c"],
            )
        )
        p = ld.snmgp_unwhiten(
            eta, x, hyp["mu_tilde_l"], hyp["mu_tilde_sigma"], chol_l, chol_s, M
        )
        pars_c = jnp.concatenate(
            [p.tilde_l, p.tilde_sigma, p.uL_vec, jnp.reshape(p.tilde_sigma2_err, (1,))]
        )
        # centered prior jitter uses the same _prior_jitter scaling; x64 makes
        # the Kronecker eigendecomposition comparable
        lc = float(ld.snmgp_log_posterior(pars_c, Y, x, **hyp))
        diffs.append(lw - lc)
    diffs = np.array(diffs)
    np.testing.assert_allclose(diffs, diffs[0], atol=1e-5)


def test_deviances_consistent_with_posteriors():
    """deviance = -2 loglik: log_posterior(prior=False) == -deviance/2."""
    x, Y = _data()
    pars_lmc = jnp.asarray(
        np.concatenate([[-0.3, 0.1], 0.5 + 0.1 * RNG.standard_normal(T), [-1.0]])
    )
    lp = float(ld.lmc_log_posterior(pars_lmc, Y, x, prior=False))
    # deviance uses the *constrained* layout: transform before comparing
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        uvec_to_lvec,
    )

    p = ld.lmc_unflatten(pars_lmc, M)
    pars_dev = jnp.concatenate(
        [
            jnp.reshape(p.tilde_l, (1,)),
            jnp.reshape(p.tilde_sigma, (1,)),
            uvec_to_lvec(p.uL_vec, M),
            jnp.reshape(p.tilde_sigma2_err, (1,)),
        ]
    )
    dev = float(ld.lmc_deviance(pars_dev, Y, x))
    np.testing.assert_allclose(lp, -dev / 2, rtol=1e-8)

    pars_svc = jnp.asarray(
        np.concatenate(
            [0.1 * RNG.standard_normal(N) - 1, 0.2 * RNG.standard_normal(N * T), [-1.0]]
        )
    )
    lp2 = float(ld.svc_log_posterior(pars_svc, Y, x, prior=False))
    p2 = ld.svc_unflatten(pars_svc, N, M)
    lvecs = uvec_to_lvec(p2.uL_vecs.reshape(N, T), M).reshape(-1)
    pars_dev2 = jnp.concatenate(
        [p2.tilde_l, lvecs, jnp.reshape(p2.tilde_sigma2_err, (1,))]
    )
    dev2 = float(ld.svc_deviance(pars_dev2, Y, x))
    np.testing.assert_allclose(lp2, -dev2 / 2, rtol=1e-8)
