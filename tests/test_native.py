"""Native host-ops library vs NumPy oracles (builds the .so on first run)."""

import numpy as np
import pytest

from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils import native

RNG = np.random.default_rng(7)


def test_library_builds_and_loads():
    assert native.available(), "libcnmgp_host.so failed to build/load"


def test_semivariogram_matches_numpy():
    n = 60
    x = np.sort(RNG.random(n))
    y = RNG.standard_normal(n)
    lag, sv = native.semivariogram(x, y)
    iu, ju = np.triu_indices(n, k=1)
    np.testing.assert_allclose(lag, x[ju] - x[iu], rtol=1e-14)
    np.testing.assert_allclose(sv, 0.5 * (y[ju] - y[iu]) ** 2, rtol=1e-12)


def test_semivariogram_multi_matches_single():
    n, m = 40, 3
    x = np.sort(RNG.random(n))
    Y = RNG.standard_normal((n, m))
    lag, sv = native.semivariogram_multi(x, Y)
    for c in range(m):
        lag1, sv1 = native.semivariogram(x, Y[:, c])
        np.testing.assert_allclose(lag, lag1)
        np.testing.assert_allclose(sv[c], sv1, rtol=1e-12)


def test_windowed_scatter_cov_matches_numpy():
    n, m, w = 50, 4, 8
    Y = RNG.standard_normal((n, m))
    got = native.windowed_scatter_cov(Y, w)
    for p in [0, 5, 25, 49]:
        s = max(0, p - w)
        e = min(p + w, n - 1)
        seg = Y[s:e]
        expected = seg.T @ seg / max(seg.shape[0] - 1, 1)
        np.testing.assert_allclose(got[p], expected, rtol=1e-12)


def test_knn_matches_argsort():
    n, nz, k = 200, 7, 10
    x = np.sort(RNG.random(n))
    z = RNG.random(nz)
    got = native.knn_1d(x, z, k)
    for q in range(nz):
        expected = np.argsort(np.abs(x - z[q]), kind="stable")[:k]
        np.testing.assert_array_equal(np.sort(got[q]), np.sort(expected))
