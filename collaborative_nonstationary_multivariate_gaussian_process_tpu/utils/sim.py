"""Synthetic data generators.

Re-implementations of the reference's `SIM_code/sim.py` generators:
  - `sim_mnts`: nonstationary 2-output time series with known truth
    (lengthscale process 3(x-1)^3-3, stds 1+x^2 / 2-x^2, correlation
    cos(pi x); exact MVN draw from the SVC covariance) — sim.py:18-87
  - `sim_illustration_{low,high,varying}_freq`: 2-output cosine tasks with
    frequency schedules, 100 train + 100 test points each — sim.py:89-204
"""

from __future__ import annotations

import pickle
from typing import Optional

import numpy as np

__all__ = [
    "sim_mnts",
    "sim_illustration_low_freq",
    "sim_illustration_high_freq",
    "sim_illustration_varying_freq",
]


def _gibbs_np(x, ell):
    """Gibbs kernel matrix in NumPy (truth generator path)."""
    d2 = (x[:, None] - x[None, :]) ** 2
    denom = ell[:, None] ** 2 + ell[None, :] ** 2
    pref = np.sqrt(2.0 * ell[:, None] * ell[None, :] / denom)
    return pref * np.exp(-d2 / denom)


def sim_mnts(M=2, N=200, seed=0, sigma2_err=1e-2, save_path: Optional[str] = None):
    """Multivariate nonstationary time series with known ground truth.

    Returns (x (N,), l (N,), L_vecs (N*3,), sigma2_err, Y (N, M)) matching
    the reference pickle layout (sim.py:85-86).
    """
    assert M == 2, "reference generator is 2-output"
    rng = np.random.default_rng(seed)
    x = np.sort(rng.random(N))
    tilde_l = 3 * (x - 1) ** 3 - 3
    l = np.exp(tilde_l)
    stds = np.stack([1 + x**2, 2 - x**2], axis=1)  # (N, 2)
    cors = np.cos(x * np.pi)

    L_f = np.zeros((N, M, M))
    for n in range(N):
        D_f = np.diag(stds[n])
        R_f = np.array([[1.0, cors[n]], [cors[n], 1.0]])
        B_f = D_f @ R_f @ D_f
        L_f[n] = np.linalg.cholesky(B_f)
    L_vecs = np.concatenate([Lf[[0, 1, 1], [0, 0, 1]] for Lf in L_f])

    K_x = _gibbs_np(x, l)
    # task-major covariance K[(i,n),(j,m)] = K_x[n,m] <L_f[n,i], L_f[m,j]>
    K = np.einsum("nm,nia,mja->injm", K_x, L_f, L_f).reshape(M * N, M * N)
    K += sigma2_err * np.eye(M * N)
    y = rng.multivariate_normal(np.zeros(M * N), K, method="cholesky")
    Y = y.reshape(M, N).T  # (N, M)

    out = (x, l, L_vecs, sigma2_err, Y)
    if save_path:
        with open(save_path, "wb") as f:
            pickle.dump(list(out), f)
    return out


def _illustration(freq_fn, seed=22, save_path: Optional[str] = None):
    rng = np.random.RandomState(seed)
    X1 = rng.rand(100)[:, None] * 0.8
    X2 = rng.rand(100)[:, None] * 0.8 + 0.2
    Xt1 = rng.rand(100)[:, None]
    Xt2 = rng.rand(100)[:, None]

    def f1(x):
        return 5 * np.cos(freq_fn(x)) + rng.rand(x.size)[:, None]

    def f2(x):
        c = np.cos(freq_fn(x))
        return 5 * ((1 - x) * c - x * c) + rng.rand(x.size)[:, None]

    Y1, Y2 = f1(X1), f2(X2)
    Yt1, Yt2 = f1(Xt1), f2(Xt2)
    out = ([X1, X2], [Y1, Y2], [Xt1, Xt2], [Yt1, Yt2])
    if save_path:
        with open(save_path, "wb") as f:
            pickle.dump(list(out), f)
    return out


def sim_illustration_low_freq(seed=22, save_path=None):
    """2-output cos(2*pi*x*2) tasks (sim.py:128-165)."""
    return _illustration(lambda x: 2 * np.pi * x * 2, seed, save_path)


def sim_illustration_high_freq(seed=22, save_path=None):
    """2-output cos(2*pi*x*5) tasks (sim.py:167-204)."""
    return _illustration(lambda x: 2 * np.pi * x * 5, seed, save_path)


def sim_illustration_varying_freq(seed=22, save_path=None):
    """2-output chirp cos(2*pi*x^2*5) tasks (sim.py:89-126)."""
    return _illustration(lambda x: 2 * np.pi * x * x * 5, seed, save_path)
