"""Data handling: heterotopic flattening, splits, normalization, sim loaders.

TPU-native replacements for:
  - `vec2list` / list-of-arrays plumbing     (reference nmgp_dsvi.py:745-755)
  - `data_split*`                            (SIM_code/Utility/utils.py:91-162)
  - `orig2adj` / `adj2orig` detrending       (SIM_code/Utility/preprocess_realdata.py:6-65)
  - simulation pickle loading                (nmgp_dsvi.py:968-984)

The central structure is `FlatData`: heterotopic per-output lists flattened to
static-shape (x, y, idx) arrays — jit sees one gather instead of ragged lists.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

__all__ = [
    "FlatData",
    "flatten_output_lists",
    "unflatten_to_lists",
    "load_sim_pickle",
    "data_split",
    "data_split_non",
    "data_split_non_chunk",
    "data_split_extrapolation",
    "orig2adj",
    "adj2orig",
    "orig2adj_lists",
    "adj2orig_lists",
]


@dataclass
class FlatData:
    """Flattened heterotopic multi-output data with static shapes."""

    x: np.ndarray  # (N,) float
    y: np.ndarray  # (N,) float
    idx: np.ndarray  # (N,) int32 output index
    dim_outputs: int

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def lists(self) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        return unflatten_to_lists(self.x, self.y, self.idx, self.dim_outputs)


def flatten_output_lists(X_list: Sequence, Y_list: Sequence) -> FlatData:
    """Per-output lists -> flat (x, y, idx). Mirrors the concatenation +
    index-tagging idiom at nmgp_dsvi.py:762-770."""
    D = len(X_list)
    xs, ys, idxs = [], [], []
    for d in range(D):
        x = np.asarray(X_list[d]).reshape(-1)
        y = np.asarray(Y_list[d]).reshape(-1)
        xs.append(x)
        ys.append(y)
        idxs.append(np.full(x.shape[0], d, dtype=np.int32))
    return FlatData(
        x=np.concatenate(xs),
        y=np.concatenate(ys),
        idx=np.concatenate(idxs),
        dim_outputs=D,
    )


def unflatten_to_lists(x, y, idx, dim_outputs):
    X_list = [np.asarray(x)[np.asarray(idx) == d] for d in range(dim_outputs)]
    Y_list = [np.asarray(y)[np.asarray(idx) == d] for d in range(dim_outputs)]
    return X_list, Y_list


def load_sim_pickle(path: str):
    """Load a `sim_illustration_*` pickle: [X_list, Y_list, Xt_list, Yt_list]
    (format produced by reference SIM_code/sim.py:123-124)."""
    with open(path, "rb") as f:
        X_list, Y_list, Xt_list, Yt_list = pickle.load(f)
    return X_list, Y_list, Xt_list, Yt_list


# ---------------------------------------------------------------------------
# Splits (host-side NumPy; mirrors SIM_code/Utility/utils.py:91-162)
# ---------------------------------------------------------------------------


def data_split(x, Y, test_size=0.25, random_state=22, shuffle=True):
    """Random split + reorder by x (reference utils.py:137-154)."""
    from sklearn.model_selection import train_test_split

    x_train, x_test, Y_train, Y_test = train_test_split(
        x, Y, test_size=test_size, random_state=random_state, shuffle=shuffle
    )
    ti = np.argsort(x_train)
    si = np.argsort(x_test)
    return x_train[ti], x_test[si], Y_train[ti], Y_test[si]


def data_split_non(x, indx, y, test_size=0.25, random_state=22, shuffle=True):
    """Heterotopic random split (reference utils.py:91-103)."""
    from sklearn.model_selection import train_test_split

    return train_test_split(
        x, indx, y, test_size=test_size, random_state=random_state, shuffle=shuffle
    )


def data_split_non_chunk(x, indx, y, chunk_size=0.2, random_state=22, fix=False):
    """Per-task contiguous-chunk holdout (reference utils.py:106-134)."""
    M = len(np.unique(indx))
    parts = {k: [] for k in ("xtr", "xte", "itr", "ite", "ytr", "yte")}
    rng = np.random.RandomState(random_state)
    for m in range(M):
        x_m = x[indx == m]
        y_m = y[indx == m]
        n_m = x_m.shape[0]
        n_te = int(chunk_size * n_m)
        n_tr = n_m - n_te
        s = int(np.floor(m * n_tr / (M - 1))) if fix else rng.choice(n_tr)
        tr = np.concatenate([np.arange(0, s), np.arange(s + n_te, n_m)])
        te = np.arange(s, s + n_te)
        parts["xtr"].append(x_m[tr])
        parts["xte"].append(x_m[te])
        parts["itr"].append(m * np.ones(n_tr))
        parts["ite"].append(m * np.ones(n_te))
        parts["ytr"].append(y_m[tr])
        parts["yte"].append(y_m[te])
    return tuple(
        np.concatenate(parts[k]) for k in ("xtr", "xte", "itr", "ite", "ytr", "yte")
    )


def data_split_extrapolation(x, Y, size=5):
    """Last-`size` holdout (reference utils.py:157-162)."""
    return x[:-size], x[-size:], Y[:-size], Y[-size:]


# ---------------------------------------------------------------------------
# Detrend / normalize (reference preprocess_realdata.py:6-65)
# ---------------------------------------------------------------------------


def orig2adj(Y):
    trend = np.mean(Y, axis=0)
    adjY = Y - trend
    scale = np.std(adjY, axis=0)
    return adjY / scale, trend, scale


def adj2orig(adjY, trend, scale):
    return adjY * scale + trend


def orig2adj_lists(y_list):
    adj, trends, scales = [], [], []
    for y in y_list:
        t = np.mean(y)
        a = y - t
        s = np.std(a)
        adj.append(a / s)
        trends.append(t)
        scales.append(s)
    return adj, trends, scales


def adj2orig_lists(adj_y_list, trend_list, scale_list):
    return [a * s + t for a, t, s in zip(adj_y_list, trend_list, scale_list)]
