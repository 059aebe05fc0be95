"""Kronecker algebra + structured MVN log-pdfs vs dense oracles.

Mirrors the reference's own `__main__` consistency checks
(kronecker_operation.py:88-116, distributions.py:139-169) as real tests.
"""

import numpy as np
import jax.numpy as jnp
from scipy.stats import multivariate_normal

from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.kron import (
    kron,
    kron_diag,
    kron_inv,
    kron_logdet,
    kron_mv,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.distributions import (
    gamma_logpdf,
    inverse_gamma_logpdf,
    mvn_logpdf_chol,
    mvn_logpdf_dense,
    mvn_logpdf_kron,
    normal_logprob_sum,
)

RNG = np.random.default_rng(2)


def rand_spd(n):
    A = RNG.normal(size=(n, n))
    return A @ A.T + n * np.eye(n)


def test_kron_mv_vs_dense():
    B = RNG.normal(size=(3, 4))
    K = RNG.normal(size=(5, 6))
    y = RNG.normal(size=4 * 6)
    got = np.asarray(kron_mv(jnp.asarray(B), jnp.asarray(K), jnp.asarray(y)))
    np.testing.assert_allclose(got, np.kron(B, K) @ y, rtol=1e-10)


def test_kron_diag():
    d1 = RNG.normal(size=3)
    d2 = RNG.normal(size=4)
    got = np.asarray(kron_diag(jnp.asarray(d1), jnp.asarray(d2)))
    np.testing.assert_allclose(got, np.diag(np.kron(np.diag(d1), np.diag(d2))))


def test_kron_inv_logdet_vs_dense():
    B = rand_spd(3)
    K = rand_spd(4)
    s2 = 0.3
    S = np.kron(B, K) + s2 * np.eye(12)
    np.testing.assert_allclose(
        np.asarray(kron_inv(s2, jnp.asarray(B), jnp.asarray(K))), np.linalg.inv(S), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        float(kron_logdet(s2, jnp.asarray(B), jnp.asarray(K))),
        np.linalg.slogdet(S)[1],
        rtol=1e-9,
    )


def test_mvn_logpdf_kron_vs_dense_oracle():
    M, N = 3, 5
    B = rand_spd(M)
    K = rand_spd(N)
    s2 = 0.7
    y = RNG.normal(size=M * N)
    mu = RNG.normal(size=M * N)
    S = np.kron(B, K) + s2 * np.eye(M * N)
    got = float(mvn_logpdf_kron(jnp.asarray(y), jnp.asarray(mu), jnp.asarray(B), jnp.asarray(K), s2))
    # un-normalized: full logpdf + 0.5*n*log(2pi)
    expected = multivariate_normal.logpdf(y, mean=mu, cov=S) + 0.5 * M * N * np.log(2 * np.pi)
    np.testing.assert_allclose(got, expected, rtol=1e-8)


def test_mvn_logpdf_dense_oracle():
    n = 6
    S = rand_spd(n)
    y = RNG.normal(size=n)
    mu = RNG.normal(size=n)
    got = float(mvn_logpdf_dense(jnp.asarray(y), jnp.asarray(mu), jnp.asarray(S)))
    expected = multivariate_normal.logpdf(y, mean=mu, cov=S) + 0.5 * n * np.log(2 * np.pi)
    np.testing.assert_allclose(got, expected, rtol=1e-9)
    got_n = float(mvn_logpdf_chol(jnp.asarray(y), jnp.asarray(mu), jnp.asarray(S)))
    np.testing.assert_allclose(got_n, multivariate_normal.logpdf(y, mean=mu, cov=S), rtol=1e-9)


def test_normal_logprob_sum():
    from scipy.stats import norm

    y = RNG.normal(size=10)
    loc = RNG.normal(size=10)
    scale = 0.7
    got = float(normal_logprob_sum(jnp.asarray(loc), jnp.asarray(scale), jnp.asarray(y)))
    np.testing.assert_allclose(got, norm.logpdf(y, loc=loc, scale=scale).sum(), rtol=1e-10)


def test_inverse_gamma_gamma_logpdf():
    from scipy.stats import gamma as sgamma
    from scipy.stats import invgamma

    x = 1.7
    np.testing.assert_allclose(
        float(inverse_gamma_logpdf(jnp.asarray(x), 2.0, 3.0)),
        invgamma.logpdf(x, a=2.0, scale=3.0),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        float(gamma_logpdf(jnp.asarray(x), 2.0, 3.0)),
        sgamma.logpdf(x, a=2.0, scale=1 / 3.0),
        rtol=1e-10,
    )
