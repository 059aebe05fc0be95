"""Kernel construction vs naive NumPy oracles.

The dense-vs-structured oracle idiom is the reference's own verification
style (SURVEY.md §4); here the oracle is a literal loop transcription of the
kernel formulas.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.kernels import (
    gibbs,
    nonstationary_rbf,
    rbf,
    sq_dist,
)

RNG = np.random.default_rng(0)


def naive_sq_dist(x1, x2):
    x1 = x1.reshape(len(x1), -1)
    x2 = x2.reshape(len(x2), -1)
    return np.array(
        [[np.sum((a - b) ** 2) for b in x2] for a in x1]
    )


def test_sq_dist_matches_naive():
    x1 = RNG.normal(size=(7, 3))
    x2 = RNG.normal(size=(5, 3))
    np.testing.assert_allclose(sq_dist(x1, x2), naive_sq_dist(x1, x2), atol=1e-10)


def test_sq_dist_1d_inputs():
    x1 = RNG.normal(size=11)
    x2 = RNG.normal(size=4)
    np.testing.assert_allclose(sq_dist(x1, x2), naive_sq_dist(x1, x2), atol=1e-10)


def test_rbf_formula():
    x1 = RNG.normal(size=6)
    x2 = RNG.normal(size=9)
    s2, ls = 1.7, 0.4
    K = np.asarray(rbf(x1, x2, s2, ls))
    expected = s2 * np.exp(-0.5 * naive_sq_dist(x1, x2) / ls**2)
    np.testing.assert_allclose(K, expected, rtol=1e-10)


def test_rbf_diag_is_scale2():
    x = RNG.normal(size=5)
    K = np.asarray(rbf(x, x, 2.5, 1.3))
    np.testing.assert_allclose(np.diag(K), 2.5, rtol=1e-12)


def test_gibbs_formula():
    x1 = RNG.normal(size=6)
    x2 = RNG.normal(size=4)
    e1 = np.exp(RNG.normal(size=6))
    e2 = np.exp(RNG.normal(size=4))
    s2 = 1.3
    K = np.asarray(gibbs(x1, x2, e1, e2, s2))
    expected = np.zeros((6, 4))
    for i in range(6):
        for j in range(4):
            denom = e1[i] ** 2 + e2[j] ** 2
            pref = np.sqrt(2 * e1[i] * e2[j] / denom)
            expected[i, j] = s2 * pref * np.exp(-((x1[i] - x2[j]) ** 2) / denom)
    np.testing.assert_allclose(K, expected, rtol=1e-10)


def test_gibbs_reduces_to_rbf_for_constant_ell():
    """With l(x) = l constant, Gibbs == RBF with sq-exp denominator 2l²."""
    x = np.sort(RNG.normal(size=8))
    ell = 0.7 * np.ones(8)
    K_g = np.asarray(gibbs(x, x, ell, ell, 1.0))
    # k = exp(-d²/(2l²)) = RBF with length_scale l... rbf uses exp(-0.5 d²/ls²)
    K_r = np.asarray(rbf(x, x, 1.0, 0.7))
    np.testing.assert_allclose(K_g, K_r, rtol=1e-10)


def test_nonstationary_rbf_with_sigma():
    x = RNG.normal(size=5)
    ell = np.exp(RNG.normal(size=5))
    sig = np.exp(RNG.normal(size=5))
    K = np.asarray(nonstationary_rbf(x, sigma1=sig, ell1=ell))
    base = np.asarray(gibbs(x, x, ell, ell, 1.0))
    np.testing.assert_allclose(K, sig[:, None] * sig[None, :] * base, rtol=1e-10)
    np.testing.assert_allclose(K, K.T, rtol=1e-10)


def test_gibbs_psd():
    x = np.sort(RNG.normal(size=30))
    ell = np.exp(0.3 * RNG.normal(size=30))
    K = np.asarray(gibbs(x, x, ell, ell, 1.0))
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-8


def test_sq_dist_exact_at_large_input_scale_f32():
    """HCP-scale regression: with x up to 4800 and length scale e^5, the
    ||a||^2+||b||^2-2ab expansion loses ~eps*||x||^2 to f32 cancellation
    (order of the 1e-4 Cholesky jitter) and the stationary gram goes
    indefinite — every HCP training step NaN'd.  sq_dist must be exact at
    low d so chol(K + jitter I) stays finite in f32."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.kernels import (
        rbf,
        sq_dist,
    )

    x = jnp.asarray(np.linspace(0.0, 4800.0, 100), jnp.float32)
    ls = float(np.exp(5.0))
    # exactness vs f64 oracle
    d2 = np.asarray(sq_dist(x / ls, x / ls), np.float64)
    xx = np.asarray(x, np.float64) / ls
    d2_ref = (xx[:, None] - xx[None, :]) ** 2
    # f32-exact RELATIVE to the distance (the expansion's error was
    # ABSOLUTE ~eps*||x||^2 — large even for near pairs, where it matters)
    assert np.max(np.abs(d2 - d2_ref) / (1.0 + d2_ref)) < 1e-5
    # the gram factorizes in f32 with the standard jitter
    K = rbf(x, x, 1.0, ls) + 1e-4 * jnp.eye(100, dtype=jnp.float32)
    L = jnp.linalg.cholesky(K)
    assert bool(jnp.all(jnp.isfinite(L)))
