"""Plot-family smoke tests: every reference `Plot_posterior*` port renders
and writes PNGs (reference SIM_code/Utility/visualization.py:9-127,
synthetic_plot.py:101-142)."""

import os

import numpy as np

from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.visualization import (
    plot_posterior,
    plot_posterior_hadamard,
    plot_posterior_train_test,
    plot_posterior_train_test_non,
    plot_process_overlay,
    samples2quantiles,
)


def test_samples2quantiles_shape():
    s = np.random.default_rng(0).standard_normal((30, 50, 2))
    q = samples2quantiles(s)
    assert q.shape == (3, 30, 2)
    assert np.all(q[0] <= q[1]) and np.all(q[1] <= q[2])


def test_plot_posterior_family_writes_pngs(tmp_path):
    rng = np.random.default_rng(1)
    N, G, M = 25, 40, 2
    x = np.sort(rng.random(N))
    Y = rng.standard_normal((N, M))
    grids = np.linspace(0, 1, G)
    q = samples2quantiles(rng.standard_normal((G, 60, M)))

    d = str(tmp_path / "iso")
    figs = plot_posterior(x, Y, grids, q, save_dir=d, attributes=["a", "b"])
    assert len(figs) == M
    assert sorted(os.listdir(d)) == ["Pos_pred_a_MAP.png", "Pos_pred_b_MAP.png"]

    d2 = str(tmp_path / "had")
    indx = rng.integers(0, M, N)
    figs = plot_posterior_hadamard(x, indx, Y[:, 0], grids, q, save_dir=d2)
    assert len(figs) == len(np.unique(indx))
    assert len(os.listdir(d2)) == len(np.unique(indx))

    d3 = str(tmp_path / "tt")
    xt = np.sort(rng.random(10))
    Yt = rng.standard_normal((10, M))
    figs = plot_posterior_train_test(
        x, Y, grids, q, xt, Yt, Yt + 0.1, save_dir=d3, attributes=["u", "v"]
    )
    assert len(os.listdir(d3)) == M

    d4 = str(tmp_path / "non")
    figs = plot_posterior_train_test_non(
        [x, x], [Y[:, 0], Y[:, 1]], grids, [q[:, :, 0], q[:, :, 1]],
        [xt, xt], [Yt[:, 0], Yt[:, 1]], [Yt[:, 0], Yt[:, 1]], save_dir=d4,
    )
    assert len(os.listdir(d4)) == 2


def test_plot_process_overlay(tmp_path):
    x = np.linspace(0, 1, 50)
    path = str(tmp_path / "ov" / "overlay.png")
    fig = plot_process_overlay(
        x, np.sin(x), np.sin(x) + 0.05, init=np.cos(x),
        quantiles=np.stack([np.sin(x) - 0.2, np.sin(x) + 0.2]),
        ylabel="log lengthscale", save_path=path,
    )
    assert os.path.exists(path)
