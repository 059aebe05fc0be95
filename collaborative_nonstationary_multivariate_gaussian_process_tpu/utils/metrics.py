"""Evaluation metrics: RMSE / MSE / LPD / CI length / coverage, and the
information criteria AIC / BIC / DIC.

Replaces:
  - `MSE`/`RMSE`/`LPD`            (reference SIM_code/Utility/utils.py:165-197)
  - coverage / CI-length analysis (reference nmgp_dsvi.py:1050-1068)
  - `get_AIC`/`get_BIC`/`get_DIC` (reference SIM_code/Utility/model_validation.py:9-51)
"""

from __future__ import annotations

from typing import Callable

import numpy as np
from scipy.stats import norm

__all__ = [
    "mse",
    "rmse",
    "lpd",
    "ci_length_and_coverage",
    "predictive_summary",
    "aic",
    "bic",
    "dic",
]


def mse(x, y, axis=None):
    return np.mean((np.asarray(x) - np.asarray(y)) ** 2, axis=axis)


def rmse(x, y, axis=None):
    return np.sqrt(mse(x, y, axis=axis))


def lpd(mean_array, std_array, y_array):
    """Mean log predictive density (reference utils.py:185-197), vectorized."""
    m = np.asarray(mean_array).reshape(-1)
    s = np.asarray(std_array).reshape(-1)
    y = np.asarray(y_array).reshape(-1)
    return float(np.mean(norm.logpdf(y, loc=m, scale=s)))


def ci_length_and_coverage(samples, y_true, q=(2.5, 97.5), test_index=None, dim_outputs=None):
    """95% central-interval mean length + empirical coverage.

    `samples`: (S, N) posterior predictive draws; `y_true`: (N,).
    Mirrors nmgp_dsvi.py:1055-1068 (per-output coverage when `test_index`
    given, else global).
    """
    samples = np.asarray(samples)
    y_true = np.asarray(y_true).reshape(-1)
    lo, hi = np.percentile(samples, q=q, axis=0)
    length = float(np.mean(hi - lo))
    inside = (y_true > lo) & (y_true < hi)
    if test_index is None:
        return length, float(np.mean(inside))
    test_index = np.asarray(test_index).reshape(-1).astype(int)
    D = dim_outputs or int(test_index.max()) + 1
    cov = np.array([inside[test_index == d].mean() for d in range(D)])
    return length, cov


def predictive_summary(samples, y_true, test_index=None, dim_outputs=None):
    """RMSE of the posterior mean + CI length + coverage in one call."""
    mean = np.mean(np.asarray(samples), axis=0)
    r = rmse(mean, np.asarray(y_true).reshape(-1))
    length, cov = ci_length_and_coverage(
        samples, y_true, test_index=test_index, dim_outputs=dim_outputs
    )
    return float(r), length, cov


# ---------------------------------------------------------------------------
# Information criteria (reference model_validation.py:9-51)
# ---------------------------------------------------------------------------


def aic(pars, deviance_func: Callable, *args, **kwargs):
    n_p = np.asarray(pars).shape[0]
    return float(deviance_func(pars, *args, **kwargs)) + 2 * n_p


def bic(pars, deviance_func: Callable, n_obs: int, *args, **kwargs):
    n_p = np.asarray(pars).shape[0]
    return float(deviance_func(pars, *args, **kwargs)) + np.log(n_obs) * n_p


def dic(pars_hist, deviance_func: Callable, *args, **kwargs):
    pars_hist = np.asarray(pars_hist)
    devs = np.array([float(deviance_func(p, *args, **kwargs)) for p in pars_hist])
    bar_d = devs.mean()
    p_d = bar_d - float(deviance_func(pars_hist.mean(axis=0), *args, **kwargs))
    return bar_d + p_d
