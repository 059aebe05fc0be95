"""ETL pipelines vs the notebooks' committed shape oracles (VERDICT r2
item 8 / item 3 of "What's missing").

The raw data is private, so each test builds a synthetic fixture whose
shape/missingness profile matches the numbers committed in the reference
notebooks' cell outputs, and asserts our ETL reproduces those outputs
EXACTLY:

  PM25 (notebook/PM25.ipynb cells 4-6): per-attribute non-null counts
    {PM_US Post: 50387, DEWP: 52579, HUMI: 52245, PRES: 52245,
     TEMP: 52579, Iws: 52579}; full split 302,537 train / 10,077 test;
    sub (first 5000 rows) split 28,768 / 942.
  HCP (notebook/HCP.ipynb cells 4-5): 4800 x 15 -> 71,040 / 960.
  ECoG (notebook/ECoG.ipynb cell 1 + NMGP_ECoG_full.py:78-144): 400 Hz
    [14 s, 16 s) window -> 800 steps/channel, z-scored.
"""

import csv
import pickle

import numpy as np
import pytest

from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.etl import (
    PM25_ATTRIBUTES,
    etl_ecog,
    etl_hcp,
    etl_pm25,
)

# ---------------------------------------------------------------------------
# PM25
# ---------------------------------------------------------------------------

N_ROWS = 52584  # Beijing CSV 2010-2015 hourly
# (total NaNs, NaNs within the first 5000 rows) per attribute — chosen so
# the non-null counts equal the notebook's committed cell-4 output and the
# sub dataset's PM count gives int(0.2 * N) == 942.
PM25_NANS = {
    "PM_US Post": (2197, 288),  # -> 50387 non-null, 4712 in first 5000
    "DEWP": (5, 0),  # -> 52579
    "HUMI": (339, 1),  # -> 52245
    "PRES": (339, 1),  # -> 52245
    "TEMP": (5, 0),  # -> 52579
    "Iws": (5, 0),  # -> 52579
}


@pytest.fixture(scope="module")
def pm25_csv(tmp_path_factory):
    rng = np.random.RandomState(0)
    path = tmp_path_factory.mktemp("pm25") / "beijing.csv"
    cols = {}
    for name, (total, in_first) in PM25_NANS.items():
        v = rng.standard_normal(N_ROWS) * 10 + 50
        nan_idx = np.concatenate(
            [
                rng.choice(5000, in_first, replace=False),
                5000 + rng.choice(N_ROWS - 5000, total - in_first, replace=False),
            ]
        )
        v[nan_idx.astype(int)] = np.nan
        cols[name] = v
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["No"] + list(PM25_NANS))
        w.writeheader()
        for i in range(N_ROWS):
            row = {"No": i + 1}
            for name in PM25_NANS:
                v = cols[name][i]
                row[name] = "NA" if np.isnan(v) else f"{v:.4f}"
            w.writerow(row)
    return path


def test_pm25_full_shape_oracle(pm25_csv):
    X, Y, Xt, Yt = etl_pm25(str(pm25_csv))
    # per-attribute non-null counts (cell 4 output), with attr 0 split
    counts = {"PM_US Post": 50387, "DEWP": 52579, "HUMI": 52245,
              "PRES": 52245, "TEMP": 52579, "Iws": 52579}
    assert Xt[0].shape[0] == 10077  # int(0.2 * 50387)
    assert X[0].shape[0] == counts["PM_US Post"] - 10077
    for i, name in enumerate(PM25_ATTRIBUTES[1:], start=1):
        assert X[i].shape[0] == counts[name]
        assert Xt[i].shape[0] == 0
    assert sum(x.shape[0] for x in X) == 302537  # cell 5 committed output
    assert sum(x.shape[0] for x in Xt) == 10077


def test_pm25_sub_shape_oracle(pm25_csv):
    X, Y, Xt, Yt = etl_pm25(str(pm25_csv), sub_rows=5000)
    assert sum(x.shape[0] for x in X) == 28768  # cell 6 committed output
    assert sum(x.shape[0] for x in Xt) == 942


def test_pm25_transform_semantics(pm25_csv):
    X, Y, Xt, Yt = etl_pm25(str(pm25_csv), sub_rows=5000)
    for i in range(6):
        y_all = np.concatenate([Y[i], Yt[i]])
        # standardized BEFORE the split, so train+test pooled has exact
        # zero mean / unit population std
        np.testing.assert_allclose(y_all.mean(), 0.0, atol=1e-9)
        np.testing.assert_allclose(y_all.std(), 1.0, rtol=1e-9)
        assert np.all(np.isfinite(Y[i]))
    # inputs are the CSV `No` column (1-based), not positions
    assert X[1].min() >= 1.0
    # train/test of attribute 0 are disjoint positions
    assert set(Xt[0].tolist()).isdisjoint(set(X[0].tolist()))


# ---------------------------------------------------------------------------
# HCP
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hcp_txt(tmp_path_factory):
    rng = np.random.RandomState(1)
    path = tmp_path_factory.mktemp("hcp") / "990366_15.txt"
    arr = rng.standard_normal((4800, 15)) * 3 + 1
    np.savetxt(path, arr, fmt="%.6f", delimiter=" ")
    return path


def test_hcp_shape_oracle(hcp_txt):
    X, Y, Xt, Yt = etl_hcp(str(hcp_txt))
    assert len(X) == 15
    assert sum(x.shape[0] for x in X) == 71040  # cell 5 committed output
    assert sum(x.shape[0] for x in Xt) == 960  # int(0.2 * 4800), series 0
    assert Xt[0].shape[0] == 960 and all(x.shape[0] == 0 for x in Xt[1:])
    for i in range(15):
        y_all = np.concatenate([Y[i], Yt[i]])
        np.testing.assert_allclose(y_all.mean(), 0.0, atol=1e-9)
        np.testing.assert_allclose(y_all.std(), 1.0, rtol=1e-9)


def test_hcp_transposed_input_handled(hcp_txt, tmp_path):
    """A (series x time) file must be read identically to (time x series)."""
    arr = np.loadtxt(hcp_txt)
    path_t = tmp_path / "transposed.txt"
    np.savetxt(path_t, arr.T, fmt="%.6f", delimiter=" ")
    X1, Y1, _, _ = etl_hcp(str(hcp_txt))
    X2, Y2, _, _ = etl_hcp(str(path_t))
    for a, b in zip(Y1, Y2):
        np.testing.assert_allclose(a, b, rtol=1e-9)


# ---------------------------------------------------------------------------
# ECoG
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ecog_pickle(tmp_path_factory):
    rng = np.random.RandomState(2)
    path = tmp_path_factory.mktemp("ecog") / "hilb.pickle"
    n, m = 8000, 8
    times = np.arange(n) / 400.0
    band_resps = rng.standard_normal((n, m)) * 5 + 2
    with open(path, "wb") as f:
        pickle.dump([times, band_resps], f)
    return path, band_resps


def test_ecog_window_and_zscore(ecog_pickle):
    path, band = ecog_pickle
    X, Y = etl_ecog(str(path), time_start=14.0, time_stop=16.0, rate=400.0)
    assert len(X) == 8
    for x, y in zip(X, Y):
        # 400 Hz x 2 s window = 800 steps (NMGP_ECoG_full.py:202-214 shape)
        assert x.shape == (800,) and y.shape == (800,)
        np.testing.assert_array_equal(x, np.arange(800))
        np.testing.assert_allclose(y.mean(), 0.0, atol=1e-9)
        np.testing.assert_allclose(y.std(), 1.0, rtol=1e-9)
    # the window is exactly rows [14*400, 16*400)
    w = band[5600:6400, 0]
    np.testing.assert_allclose(Y[0], (w - w.mean()) / w.std(), rtol=1e-9)


def test_ecog_channel_selection_order(ecog_pickle):
    path, band = ecog_pickle
    X, Y = etl_ecog(
        str(path), time_start=14.0, time_stop=16.0, rate=400.0,
        channel_indexes=[3, 1],
    )
    assert len(Y) == 2
    w3 = band[5600:6400, 3]
    np.testing.assert_allclose(Y[0], (w3 - w3.mean()) / w3.std(), rtol=1e-9)
    w1 = band[5600:6400, 1]
    np.testing.assert_allclose(Y[1], (w1 - w1.mean()) / w1.std(), rtol=1e-9)


# ---------------------------------------------------------------------------
# Raw-file -> workload-driver bridge (load_workload_data)
# ---------------------------------------------------------------------------


def test_load_workload_data_routes_raw_csv(pm25_csv):
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.etl import (
        load_workload_data,
    )

    X, Y, Xt, Yt = load_workload_data("pm25", str(pm25_csv), full=False)
    assert sum(x.shape[0] for x in X) == 28768  # sub oracle
    X2, _, _, _ = load_workload_data("pm25", str(pm25_csv), full=True)
    assert sum(x.shape[0] for x in X2) == 302537  # full oracle


def test_load_workload_data_routes_raw_txt(hcp_txt):
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.etl import (
        load_workload_data,
    )

    X, Y, Xt, Yt = load_workload_data("hcp", str(hcp_txt))
    assert sum(x.shape[0] for x in X) == 71040 and Xt[0].shape[0] == 960


def test_load_workload_data_routes_raw_ecog_blob(ecog_pickle):
    """A raw Hilbert blob goes through etl_ecog + the prediction split;
    a 3-element (times, band_resps, time_trials) R32_B7-style blob
    (NMGP_ECoG_pred.py:104-107) parses the same."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.etl import (
        ecog_pred_split,
        etl_ecog,
        load_workload_data,
    )

    path, band = ecog_pickle
    X, Y, Xt, Yt = load_workload_data("ecog", str(path))
    D = len(X)
    # last channel split 20%; all other channels full 800-step windows
    assert Xt[-1].shape[0] == 800 // 5 and X[-1].shape[0] == 800 - 800 // 5
    assert all(x.shape[0] == 0 for x in Xt[:-1])
    # equals the two-step composition
    X0, Y0 = etl_ecog(str(path))
    Xr, Yr, Xtr, Ytr = ecog_pred_split(X0, Y0)
    np.testing.assert_array_equal(X[-1], Xr[-1])
    np.testing.assert_allclose(Y[-1], Yr[-1])

    # R32_B7 layout: extra time_trials element must not confuse the router
    blob3 = path.parent / "r32b7.pickle"
    times = np.arange(band.shape[0]) / 400.0
    with open(blob3, "wb") as f:
        pickle.dump([times, band, np.array([[14.0, 16.0]])], f)
    X3, Y3, _, _ = load_workload_data("ecog", str(blob3))
    np.testing.assert_allclose(Y3[-1], Y[-1])


def test_load_workload_data_presplit_pickle(tmp_path):
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.etl import (
        load_workload_data,
    )

    X_list = [np.arange(5.0), np.arange(4.0)]
    Y_list = [np.ones(5), np.zeros(4)]
    Xt_list = [np.arange(2.0), np.empty(0)]
    Yt_list = [np.ones(2), np.empty(0)]
    p = tmp_path / "presplit.pickle"
    with open(p, "wb") as f:
        pickle.dump([X_list, Y_list, Xt_list, Yt_list], f)
    X, Y, Xt, Yt = load_workload_data("hcp", str(p))
    np.testing.assert_array_equal(X[0], X_list[0])
    np.testing.assert_array_equal(Yt[0], Yt_list[0])


def test_load_workload_data_rejects_garbage(tmp_path):
    import pytest as _pytest

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.etl import (
        load_workload_data,
    )

    p = tmp_path / "junk.pickle"
    with open(p, "wb") as f:
        pickle.dump({"not": "a dataset"}, f)
    with _pytest.raises(ValueError, match="unrecognized data file"):
        load_workload_data("pm25", str(p))
