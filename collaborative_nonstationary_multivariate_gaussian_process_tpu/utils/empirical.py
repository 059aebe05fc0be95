"""Empirical (variogram-based) parameter estimation for MCMC initialization.

Host-side NumPy port of the reference's `empirical_estimation.py`
(SIM_code/Utility/empirical_estimation.py:35-190): sliding-window Gaussian
variogram fits for local (sigma, ell), windowed sample covariances for the
local Cholesky process, and a moving-average smoother.  Feeds the SVC/SNMGP
flat parameter vectors as starting points for MAP/NUTS.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from scipy.optimize import curve_fit

from ..config import PRECISION

__all__ = [
    "semivariogram",
    "variogram_gaussian",
    "global_estimation",
    "local_estimation",
    "smooth",
]


def semivariogram(x, Y, indx):
    """Experimental semivariogram over all lags (empirical_estimation.py:35-56).

    Dispatches to the native C++ pair-accumulation (utils/native.py) when the
    host library is available, else the vectorized NumPy path."""
    from . import native

    return native.semivariogram(np.asarray(x), np.asarray(Y)[:, indx])


def variogram_gaussian(s, sigma, l):
    """Gaussian variogram model (empirical_estimation.py:59-60)."""
    return sigma**2 * (1 - np.exp(-0.5 * s**2 / l**2))


def global_estimation(x, Y):
    """Global covariance Cholesky (empirical_estimation.py:63-68)."""
    M = Y.shape[1]
    S = np.cov(Y.T)
    L_f = np.linalg.cholesky(S + PRECISION * np.eye(M))
    return S, L_f[np.tril_indices(M)]


def local_estimation(x, Y, window_size: int = 30):
    """Sliding-window local parameter estimation
    (empirical_estimation.py:71-140).

    Returns dict with per-point arrays:
      sigmas (N,), ls (N,), L_vecs (N, M(M+1)/2), stds (N, M),
      R (N, M, M) local correlation matrices, B (N, M, M) covariances.
    """
    from . import native

    N, M = Y.shape
    sigmas, ls, L_vecs, stds, Rs, Bs = [], [], [], [], [], []
    # native batched windowed covariances (one pass over all points)
    S_all = native.windowed_scatter_cov(Y, window_size)
    for n in range(N):
        start = max(0, n - window_size)
        end = min(n + window_size, N - 1)
        x_seg = x[start:end]
        Y_seg = Y[start:end]
        lag, sv_all = native.semivariogram_multi(x_seg, Y_seg)
        cofs = []
        for m in range(M):
            try:
                cof, _ = curve_fit(variogram_gaussian, lag, sv_all[m], maxfev=2000)
            except RuntimeError:
                cof = np.array([np.std(Y_seg[:, m]), np.ptp(x_seg) / 2 + 1e-6])
            cofs.append(np.abs(cof))
        cof = np.mean(np.stack(cofs), axis=0)
        sigmas.append(cof[0])
        ls.append(cof[1])
        S = S_all[n]
        try:
            L_f = np.linalg.cholesky(S)
        except np.linalg.LinAlgError:
            S = S + PRECISION * np.eye(M)
            L_f = np.linalg.cholesky(S)
        Bs.append(S)
        L_vecs.append(L_f[np.tril_indices(M)])
        D = np.sqrt(np.diag(S))
        stds.append(D)
        Rs.append(np.diag(1.0 / D) @ S @ np.diag(1.0 / D))
    return dict(
        sigmas=np.array(sigmas),
        ls=np.array(ls),
        L_vecs=np.stack(L_vecs),
        stds=np.stack(stds),
        R=np.stack(Rs),
        B=np.stack(Bs),
    )


def smooth(a, window: int = 10):
    """Centered moving-average smoother (the reference smooths its local
    estimates before initializing samplers)."""
    a = np.asarray(a, dtype=float)
    kernel = np.ones(window) / window
    pad = window // 2
    padded = np.pad(a, ((pad, window - 1 - pad),) + ((0, 0),) * (a.ndim - 1), mode="edge")
    out = np.apply_along_axis(lambda v: np.convolve(v, kernel, mode="valid"), 0, padded)
    return out[: a.shape[0]]
