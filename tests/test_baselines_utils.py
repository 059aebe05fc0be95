"""Baseline models + metrics/ETL utilities."""

import numpy as np
import pytest

from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.baselines import (
    fit_icm,
    fit_igpr,
    predict_icm,
    predict_igpr,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.metrics import (
    aic,
    bic,
    ci_length_and_coverage,
    dic,
    lpd,
    rmse,
)

RNG = np.random.default_rng(9)


def _toy_multioutput(n=60, n_test=30):
    x1 = np.sort(RNG.random(n))
    x2 = np.sort(RNG.random(n))
    f = lambda t: np.sin(2 * np.pi * t)
    X_list = [x1, x2]
    Y_list = [f(x1) + 0.1 * RNG.standard_normal(n), 0.7 * f(x2) + 0.1 * RNG.standard_normal(n)]
    Xt = [np.sort(RNG.random(n_test)) for _ in range(2)]
    Yt = [f(Xt[0]), 0.7 * f(Xt[1])]
    return X_list, Y_list, Xt, Yt


def test_igpr_learns_signal():
    X_list, Y_list, Xt, Yt = _toy_multioutput()
    models = fit_igpr(X_list, Y_list, steps=300)
    means, stds = predict_igpr(models, Xt)
    for m, yt, s in zip(means, Yt, stds):
        assert rmse(m, yt) < 0.35
        assert np.all(s > 0)


def test_icm_learns_shared_structure():
    X_list, Y_list, Xt, Yt = _toy_multioutput()
    model = fit_icm(X_list, Y_list, steps=300)
    means, stds = predict_icm(model, Xt)
    for m, yt in zip(means, Yt):
        assert rmse(m, yt) < 0.35


def test_metrics_definitions():
    y = np.array([0.0, 1.0, 2.0])
    m = np.array([0.0, 1.0, 2.5])
    assert abs(rmse(m, y) - np.sqrt(0.25 / 3)) < 1e-12
    # lpd of exact mean with unit std: log(1/sqrt(2pi)) average minus sq errs
    val = lpd(m, np.ones(3), y)
    expected = np.mean(-0.5 * (y - m) ** 2 - 0.5 * np.log(2 * np.pi))
    assert abs(val - expected) < 1e-9


def test_ci_and_coverage():
    samples = RNG.standard_normal((4000, 50))
    y = np.zeros(50)
    length, cov = ci_length_and_coverage(samples, y)
    assert abs(length - 2 * 1.96) < 0.15
    assert cov > 0.9


def test_information_criteria():
    dev = lambda p: float(np.sum(p**2))
    pars = np.array([1.0, 2.0])
    assert aic(pars, dev) == 5.0 + 4
    assert abs(bic(pars, dev, n_obs=10) - (5.0 + 2 * np.log(10))) < 1e-12
    hist = np.array([[1.0, 2.0], [3.0, 0.0]])
    # bar_D = (5+9)/2 = 7; D(mean) = 4+1 = 5; DIC = 7 + (7-5) = 9
    assert abs(dic(hist, dev) - 9.0) < 1e-12


def test_synthetic_etl_shapes():
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.etl import (
        synthetic_ecog,
        synthetic_hcp,
        synthetic_pm25,
    )

    X, Y, Xt, Yt = synthetic_pm25()
    assert len(X) == 6
    assert sum(len(v) for v in X) == 28768
    assert sum(len(v) for v in Xt) == 942
    X, Y, Xt, Yt = synthetic_hcp()
    assert len(X) == 15
    assert sum(len(v) for v in X) == 71040
    X, Y = synthetic_ecog(n_channel=8, n_steps=100)
    assert len(X) == 8 and len(X[0]) == 100


def test_data_splits():
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.data import (
        data_split,
        data_split_non_chunk,
        flatten_output_lists,
        unflatten_to_lists,
    )

    x = np.sort(RNG.random(40))
    Y = RNG.standard_normal((40, 3))
    xtr, xte, Ytr, Yte = data_split(x, Y, test_size=0.25)
    assert len(xtr) == 30 and len(xte) == 10
    assert np.all(np.diff(xtr) >= 0)  # reordered by x

    indx = np.repeat(np.arange(2), 20)
    xx = np.concatenate([x[:20], x[:20]])
    yy = RNG.standard_normal(40)
    parts = data_split_non_chunk(xx, indx, yy, chunk_size=0.2, fix=True)
    assert len(parts[0]) + len(parts[1]) == 40

    fd = flatten_output_lists([x[:5], x[5:12]], [Y[:5, 0], Y[5:12, 1]])
    assert fd.n == 12 and fd.dim_outputs == 2
    Xl, Yl = unflatten_to_lists(fd.x, fd.y, fd.idx, 2)
    assert len(Xl[0]) == 5 and len(Xl[1]) == 7


def test_correlation_heatmaps(tmp_path):
    """plot_correlation_heatmaps writes one PNG per point and returns the
    x-sorted correlation stack (reference posterior_analysis.py:221-268)."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.posterior_analysis import (
        plot_correlation_heatmaps,
    )

    N, M = 4, 3
    T = M * (M + 1) // 2
    L_vecs = RNG.standard_normal(N * T)
    x = RNG.random(N)
    out_dir = tmp_path / "corr"
    xs, R = plot_correlation_heatmaps(
        x, L_vecs=L_vecs, N=N, M=M, save_dir=str(out_dir)
    )
    assert R.shape == (N, M, M)
    assert np.all(np.diff(xs) >= 0)
    np.testing.assert_allclose(np.diagonal(R, axis1=1, axis2=2), 1.0, atol=1e-12)
    assert np.all(np.abs(R) <= 1 + 1e-12)
    assert len(list(out_dir.glob("*.png"))) == N


def test_titsias_bound_tight_at_full_inducing():
    """With Z = X the Titsias collapsed bound equals the exact negative log
    marginal likelihood, and the SGPR predictive equals the exact GP
    predictive (oracle for the sparse baselines)."""
    import jax.numpy as jnp

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import (
        baselines as bl,
    )

    n = 30
    x = jnp.asarray(np.sort(RNG.random(n)))
    y = jnp.asarray(np.sin(4 * np.asarray(x)) + 0.1 * RNG.standard_normal(n))
    theta = jnp.asarray([0.1, -0.5, -2.0])
    s2, ls, noise = (float(v) for v in np.exp(np.asarray(theta)))

    exact = float(bl._nlml(theta, x, y, bl.exponential_kernel))
    Kuu = bl.exponential_kernel(x, x, s2, ls)
    kff = jnp.full(n, s2)
    nbound, Luu, LB, c = bl._titsias_parts(Kuu, Kuu, kff, y, noise + 1e-6)
    # jitter-limited agreement
    assert abs(float(nbound) - exact) < 0.05 * abs(exact) + 0.5

    xs = jnp.asarray(np.linspace(0.1, 0.9, 7))
    mu_e, sd_e = bl.predict_igpr([(theta, x, y)], [xs])
    Kus = bl.exponential_kernel(x, xs, s2, ls)
    kss = jnp.full(7, s2)
    mu_s, var_s = bl._titsias_predict(Luu, LB, c, Kus, kss, noise + 1e-6)
    np.testing.assert_allclose(np.asarray(mu_s), mu_e[0], atol=2e-3)
    np.testing.assert_allclose(np.sqrt(np.asarray(var_s)), sd_e[0], atol=2e-3)


def test_sparse_baselines_learn_signal():
    """SGPR and sparse ICM (the reference's real-data GPy baselines) recover
    a smooth shared signal with far fewer inducing points than data."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.baselines import (
        fit_sgpr,
        predict_sgpr,
        fit_sicm,
        predict_sicm,
    )

    X_list, Y_list, Xt, Yt = _toy_multioutput(n=80, n_test=20)
    sg = fit_sgpr(X_list, Y_list, num_inducing=15, steps=400, lr=0.05)
    mu, sd = predict_sgpr(sg, Xt)
    err = np.sqrt(np.mean((np.concatenate(mu) - np.concatenate(Yt)) ** 2))
    assert err < 0.35, err

    si = fit_sicm(X_list, Y_list, num_inducing=20, rank=1, steps=400, lr=0.05)
    mu2, sd2 = predict_sicm(si, Xt)
    err2 = np.sqrt(np.mean((np.concatenate(mu2) - np.concatenate(Yt)) ** 2))
    assert err2 < 0.35, err2
    assert all(np.all(np.isfinite(s)) and np.all(s > 0) for s in sd + sd2)


def test_empirical_save_load_plot_roundtrip(tmp_path):
    """save_estimates writes the reference's empirical_est.pickle layout
    ([log ls, log smooth_ls, L_vecs_flat, ts2e] — save_res,
    empirical_estimation.py:185-190), load_estimates inverts it, and
    plot_estimates writes the four diagnostic figures (visualization,
    :136-182)."""
    import numpy as np

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.empirical import (
        load_estimates,
        local_estimation,
        plot_estimates,
        save_estimates,
    )

    rng = np.random.default_rng(0)
    N, M = 60, 2
    x = np.linspace(0.0, 1.0, N)
    Y = np.stack(
        [np.sin(6 * x) + 0.1 * rng.standard_normal(N),
         np.cos(6 * x) + 0.1 * rng.standard_normal(N)],
        axis=1,
    )
    est = local_estimation(x, Y, window_size=10)

    p = save_estimates(str(tmp_path / "empirical_est.pickle"), est)
    tilde_ls, smooth_tilde_ls, L_vecs, ts2e = load_estimates(p)
    assert tilde_ls.shape == (N,)
    np.testing.assert_allclose(tilde_ls, np.log(est["ls"]))
    assert L_vecs.shape == (N * (M * (M + 1) // 2),)
    np.testing.assert_allclose(L_vecs, est["L_vecs"].ravel())
    assert ts2e == -4.0
    assert np.all(np.isfinite(smooth_tilde_ls))

    paths = plot_estimates(x, Y, est, str(tmp_path))
    import os

    assert len(paths) == 4 and all(os.path.getsize(q) > 0 for q in paths)
