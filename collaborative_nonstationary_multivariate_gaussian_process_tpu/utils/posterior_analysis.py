"""Posterior-sample analysis: history unpackers, correlation extraction,
quantile summaries, and matplotlib visualizations.

Replaces the reference's `SIM_code/Utility/posterior_analysis.py:15-268` and
`visualization.py:9-123`: vectorized unpacking of `pars_hist` arrays per
model variant, cov->corr conversion, credible-band plots.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..models.logdensities import tri_size
from ..ops.linalg import uvec_to_lvec

__all__ = [
    "unpack_hist_snmgp",
    "unpack_hist_svc",
    "unpack_hist_lmc",
    "unpack_est_snmgp",
    "unpack_est_svc",
    "unpack_est_lmc",
    "cov2cor",
    "samples2quantiles",
    "lvecs_to_corr",
    "plot_mean_and_ci",
    "plot_posterior_bands",
    "plot_correlation_heatmaps",
]


def _lvec_to_tril_np(v, m):
    L = np.zeros(v.shape[:-1] + (m, m))
    r, c = np.tril_indices(m)
    L[..., r, c] = v
    return L


def unpack_hist_snmgp(pars_hist, N, M):
    """(S, dim) -> (tilde_l (S,N), tilde_sigma (S,N), uL_vec (S,T),
    tilde_sigma2_err (S,)).  Mirrors `vec2pars` (posterior_analysis.py:59-68)."""
    pars_hist = np.asarray(pars_hist)
    T = tri_size(M)
    return (
        pars_hist[:, :N],
        pars_hist[:, N : 2 * N],
        pars_hist[:, 2 * N : 2 * N + T],
        pars_hist[:, -1],
    )


def unpack_hist_svc(pars_hist, N, M):
    """Mirrors `vec2pars_SVC` (posterior_analysis.py:70-77)."""
    pars_hist = np.asarray(pars_hist)
    T = tri_size(M)
    return pars_hist[:, :N], pars_hist[:, N : N + N * T], pars_hist[:, -1]


def unpack_hist_lmc(pars_hist, M):
    """Mirrors `vec2pars_S` (posterior_analysis.py:79-88)."""
    pars_hist = np.asarray(pars_hist)
    T = tri_size(M)
    return (
        pars_hist[:, 0],
        pars_hist[:, 1],
        pars_hist[:, 2 : 2 + T],
        pars_hist[:, -1],
    )


def unpack_est_snmgp(pars, N, M):
    """Point-estimate unpacker (posterior_analysis.py:15-24)."""
    return unpack_hist_snmgp(np.asarray(pars)[None], N, M)


def unpack_est_svc(pars, N, M):
    return unpack_hist_svc(np.asarray(pars)[None], N, M)


def unpack_est_lmc(pars, M):
    return unpack_hist_lmc(np.asarray(pars)[None], M)


def cov2cor(S):
    """Covariance -> correlation (posterior_analysis.py:47-56), batched."""
    S = np.asarray(S)
    d = 1.0 / np.sqrt(np.diagonal(S, axis1=-2, axis2=-1))
    return S * d[..., :, None] * d[..., None, :]


def lvecs_to_corr(uL_vecs, N, M, constrained=False):
    """Per-point unconstrained Cholesky vecs -> correlation processes.

    uL_vecs: (..., N*T) -> (..., N, M, M) correlation matrices (the
    correlation-process recovery of synthetic_plot.py:101-142).
    """
    import jax.numpy as jnp

    T = tri_size(M)
    u = np.asarray(uL_vecs).reshape(np.shape(uL_vecs)[:-1] + (N, T))
    lv = u if constrained else np.asarray(uvec_to_lvec(jnp.asarray(u), M))
    L = _lvec_to_tril_np(lv, M)
    B = L @ np.swapaxes(L, -1, -2)
    return cov2cor(B)


def samples2quantiles(pos_sample, percentiles=(2.5, 50.0, 97.5)):
    """(S, ...) -> (len(percentiles), ...) (posterior_analysis.py:90-98)."""
    return np.percentile(np.asarray(pos_sample), q=list(percentiles), axis=0)


def plot_mean_and_ci(x, mean, lb, ub, color_mean="b", color_shading="r", ax=None):
    """Credible-band line plot (posterior_analysis.py:101-106)."""
    import matplotlib.pyplot as plt

    if ax is None:
        ax = plt.gca()
    ax.fill_between(x, ub, lb, color=color_shading, alpha=0.3)
    ax.plot(x, mean, color=color_mean)
    return ax


def plot_posterior_bands(
    x,
    Y,
    grids,
    pos_quantile,
    x_test=None,
    Y_test=None,
    save_path: Optional[str] = None,
    attributes: Optional[Sequence[str]] = None,
):
    """Posterior predictive band plots per output (visualization.py:20-101)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    Y = np.asarray(Y)
    M = Y.shape[1]
    fig, axes = plt.subplots(M, 1, figsize=(8, 2.5 * M), squeeze=False)
    for m in range(M):
        ax = axes[m, 0]
        ax.scatter(x, Y[:, m], s=8, label="train")
        ax.plot(grids, pos_quantile[1, :, m], color="b")
        ax.plot(grids, pos_quantile[0, :, m], color="r", linestyle="dashed")
        ax.plot(grids, pos_quantile[2, :, m], color="r", linestyle="dashed")
        if x_test is not None:
            ax.scatter(x_test, np.asarray(Y_test)[:, m], s=8, color="k", label="test")
        ax.set_ylabel(attributes[m] if attributes else f"y{m + 1}")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)
    return fig


def plot_correlation_heatmaps(
    x,
    R_fs=None,
    L_vecs=None,
    N: Optional[int] = None,
    M: Optional[int] = None,
    attributes: Optional[Sequence[str]] = None,
    save_dir: Optional[str] = None,
    constrained: bool = True,
):
    """Per-input-point correlation-matrix heatmaps
    (`visualization_pos_map_heatmap{,_withR_s}`,
    reference posterior_analysis.py:221-268).

    Either pass correlation matrices `R_fs` (N, M, M) directly, or the flat
    per-point Cholesky vectors `L_vecs` (N*T,) plus (N, M) to build them
    (cov2cor of L Lᵀ).  Points are sorted by x like the reference.  Diverging
    colormap centered at 0, fixed to [-1, 1].  If `save_dir` is given, one
    PNG per point (index-prefixed, labeled by its x value) is written
    there; returns (x_sorted, R_fs_sorted).
    """
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(x).reshape(-1)
    order = np.argsort(x)
    x = x[order]
    if R_fs is None:
        if L_vecs is None or N is None or M is None:
            raise ValueError(
                "plot_correlation_heatmaps needs either R_fs (N, M, M) or "
                "L_vecs together with N and M"
            )
        R_fs = lvecs_to_corr(np.asarray(L_vecs).reshape(-1), N, M, constrained)
    R_fs = np.asarray(R_fs)[order]
    Mdim = R_fs.shape[-1]
    labels = list(attributes) if attributes else [f"y{m + 1}" for m in range(Mdim)]

    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        for n in range(x.shape[0]):
            fig, ax = plt.subplots(figsize=(4.5, 4))
            im = ax.imshow(R_fs[n], vmin=-1.0, vmax=1.0, cmap="RdBu_r")
            ax.set_xticks(range(Mdim))
            ax.set_yticks(range(Mdim))
            ax.set_xticklabels(labels, rotation=45, ha="right")
            ax.set_yticklabels(labels)
            ax.set_title(f"x = {x[n]:.4g}")
            fig.colorbar(im, ax=ax, fraction=0.046)
            # index prefix: duplicate x values must not overwrite each other
            fig.savefig(
                os.path.join(save_dir, f"{n:04d}_{x[n]:.6g}.png"),
                bbox_inches="tight",
            )
            plt.close(fig)
    return x, R_fs
