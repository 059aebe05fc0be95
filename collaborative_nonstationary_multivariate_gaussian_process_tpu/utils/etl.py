"""ETL pipelines for the real-data workloads (PM2.5 / HCP / ECoG).

Ports of the reference's ETL notebooks (code/notebook/{PM25,HCP,ECoG}.ipynb;
raw data is NOT shipped with the reference either — ReadMe.txt:7).  Each
loader accepts the raw file when present and otherwise raises; the
`synthetic_*` generators produce same-shape surrogates so the workload
drivers and benchmarks run end-to-end without the private data.

Shapes (BASELINE.md "Workload sizes"):
  PM25 sub  28,768 train / 942 test observations, 6 attributes
  HCP       71,040 / 960, 15 series x 4,800 time steps
  ECoG      78 channels x 800 steps (400 Hz window of 120,000 x 128)
"""

from __future__ import annotations

import pickle
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "etl_pm25",
    "etl_hcp",
    "etl_ecog",
    "synthetic_pm25",
    "synthetic_hcp",
    "synthetic_ecog",
]

PM25_ATTRIBUTES = ("PM2.5", "DEWP", "TEMP", "PRES", "Iws", "Is")  # 6 standardized


def _standardize(a):
    return (a - np.nanmean(a)) / np.nanstd(a)


def etl_pm25(csv_path: str, sub_sample: Optional[int] = 12, test_frac=0.032):
    """Beijing PM2.5 CSV -> ([X_list, Y_list, Xt_list, Yt_list]) pickles.

    Mirrors notebook/PM25.ipynb: 6 standardized attributes on the hourly
    time axis; `sub_sample` keeps every k-th hour (the "sub" dataset).
    """
    import csv as _csv

    rows = []
    with open(csv_path) as f:
        reader = _csv.DictReader(f)
        for r in reader:
            rows.append(r)
    t = np.arange(len(rows), dtype=float)
    cols = {}
    keymap = {"PM2.5": "pm2.5", "DEWP": "DEWP", "TEMP": "TEMP", "PRES": "PRES", "Iws": "Iws", "Is": "Is"}
    for name in PM25_ATTRIBUTES:
        raw = np.array(
            [float(r[keymap[name]]) if r[keymap[name]] not in ("", "NA") else np.nan for r in rows]
        )
        cols[name] = raw
    if sub_sample:
        t = t[::sub_sample]
        cols = {k: v[::sub_sample] for k, v in cols.items()}
    X_list, Y_list, Xt_list, Yt_list = [], [], [], []
    rng = np.random.RandomState(0)
    for name in PM25_ATTRIBUTES:
        v = cols[name]
        keep = np.isfinite(v)
        x, y = t[keep], _standardize(v[keep])
        n_test = max(int(test_frac * x.shape[0]), 1)
        te = np.sort(rng.choice(x.shape[0], n_test, replace=False))
        tr = np.setdiff1d(np.arange(x.shape[0]), te)
        X_list.append(x[tr])
        Y_list.append(y[tr])
        Xt_list.append(x[te])
        Yt_list.append(y[te])
    return X_list, Y_list, Xt_list, Yt_list


def etl_hcp(txt_path: str, n_series: int = 15, test_per_series: int = 64):
    """HCP motor-task series file (whitespace table, series x time) ->
    per-series random holdout (notebook/HCP.ipynb: 15 series x 4800)."""
    arr = np.loadtxt(txt_path)
    if arr.shape[0] < arr.shape[1]:
        arr = arr.T  # (time, series)
    arr = arr[:, :n_series]
    N = arr.shape[0]
    t = np.arange(N, dtype=float)
    rng = np.random.RandomState(0)
    X_list, Y_list, Xt_list, Yt_list = [], [], [], []
    for i in range(n_series):
        y = _standardize(arr[:, i])
        te = np.sort(rng.choice(N, test_per_series, replace=False))
        tr = np.setdiff1d(np.arange(N), te)
        X_list.append(t[tr])
        Y_list.append(y[tr])
        Xt_list.append(t[te])
        Yt_list.append(y[te])
    return X_list, Y_list, Xt_list, Yt_list


def etl_ecog(
    pickle_path: str,
    time_start: float = 14.0,
    time_stop: float = 16.0,
    rate: float = 400.0,
    channel_indexes: Optional[Sequence[int]] = None,
):
    """Hilbert high-gamma ECoG pickle -> windowed, z-scored channel lists.

    Mirrors `load_ECoG` (reference NMGP_ECoG_full.py:78-144): take the
    [time_start, time_stop) window at `rate` Hz, per-channel z-score,
    integer-timestamp inputs.
    """
    with open(pickle_path, "rb") as f:
        blob = pickle.load(f)
    times, band_resps = blob[0], blob[1]
    n = int((time_stop - time_start) * rate)
    start_idx = int(time_start * rate)
    window = band_resps[start_idx : start_idx + n]
    N, M = window.shape
    if channel_indexes is None:
        channel_indexes = list(range(M))
    X_list, Y_list = [], []
    for c in channel_indexes:
        X_list.append(np.arange(N, dtype=float))
        Y_list.append(_standardize(window[:, c]))
    return X_list, Y_list


# ---------------------------------------------------------------------------
# Same-shape synthetic surrogates (raw data is private)
# ---------------------------------------------------------------------------


def _synthetic_multioutput(n_per_out, n_test_per_out, D, t_max, seed, freq=3.0):
    rng = np.random.RandomState(seed)
    phases = rng.uniform(0, 2 * np.pi, D)
    amps = 1.0 + rng.rand(D)
    X_list, Y_list, Xt_list, Yt_list = [], [], [], []
    for d in range(D):
        x = np.sort(rng.rand(n_per_out[d])) * t_max
        xt = np.sort(rng.rand(n_test_per_out[d])) * t_max
        f = lambda t: amps[d] * np.sin(freq * 2 * np.pi * t / t_max + phases[d]) * (
            1 + 0.5 * np.cos(2 * np.pi * t / t_max)
        )
        X_list.append(x)
        Y_list.append(f(x) + 0.3 * rng.standard_normal(x.shape[0]))
        Xt_list.append(xt)
        Yt_list.append(f(xt) + 0.3 * rng.standard_normal(xt.shape[0]))
    return X_list, Y_list, Xt_list, Yt_list


def synthetic_pm25(seed=0):
    """28,768/942 obs over 6 outputs (PM25-sub shape)."""
    per = [28768 // 6] * 6
    per[0] += 28768 - sum(per)
    pert = [942 // 6] * 6
    pert[0] += 942 - sum(pert)
    return _synthetic_multioutput(per, pert, 6, t_max=2400.0, seed=seed)


def synthetic_hcp(seed=0):
    """71,040/960 obs over 15 series x 4800 steps (HCP shape)."""
    per = [71040 // 15] * 15
    pert = [960 // 15] * 15
    return _synthetic_multioutput(per, pert, 15, t_max=4800.0, seed=seed)


def synthetic_ecog(seed=0, n_channel=78, n_steps=800):
    """78 channels x 800 steps (ECoG full-train shape; no test split)."""
    X_list, Y_list, _, _ = _synthetic_multioutput(
        [n_steps] * n_channel, [1] * n_channel, n_channel, t_max=float(n_steps), seed=seed
    )
    return X_list, Y_list


def surrogate_ecog_channel_indexes(n_channel=78):
    """Deterministic surrogate for the private `78_channel_indexes.pickle`
    (reference NMGP_ECoG_full.py:202-205): electrode IDs into the 128-channel
    array for each modeled output.  The real set is unknown, but it must
    contain all 25 electrode IDs of the 5x5 analysis grid
    (`posterior_analysis.ECOG_GRID_CHANNEL_IDS`) — so the surrogate places
    the grid IDs first (sorted) and fills with the lowest remaining IDs."""
    from .posterior_analysis import ECOG_GRID_CHANNEL_IDS

    grid_ids = sorted(int(v) for v in np.unique(ECOG_GRID_CHANNEL_IDS))
    rest = [i for i in range(128) if i not in set(grid_ids)]
    ids = (grid_ids + rest)[:n_channel]
    if len(ids) < n_channel:  # pragma: no cover - n_channel > 128
        raise ValueError(f"cannot build {n_channel} surrogate channel ids")
    return np.asarray(ids)
