"""Baseline parity table (VERDICT r3, Next #7).

Runs our native-JAX IGPR / ICM baselines (models/baselines.py) on the three
shipped simulation datasets under the reference's notebook protocol
(/root/reference/code/notebook/IGPR.ipynb cell 1, ICM.ipynb cell 1):

  - IGPR: independent exact GPR per output, Exponential kernel, ML-II
  - ICM : GPCoregionalizedRegression equivalent, Exponential kernel,
          rank-1 B + kappa, shared input kernel, ML-II
  - metrics: test RMSE over stacked outputs; mean 95% CI length
    (quantiles 2.5/97.5 of the predictive incl. noise); empirical coverage

The reference's committed numbers (BASELINE.md) came from GPy; matching
them within noise shows our baselines are calibrated, which is what makes
the CNMGP-vs-baseline margins meaningful.

Run: JAX_PLATFORMS=cpu python scripts/baseline_parity.py
Writes results/baseline_parity.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

# force CPU + x64 in-process: the image's sitecustomize registers the axon
# TPU plugin at startup and pins JAX_PLATFORMS=axon, so env vars do NOT
# stick (and this host-side oracle must never claim the chip)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.baselines import (
    fit_icm,
    fit_igpr,
    predict_icm,
    predict_igpr,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.data import (
    load_sim_pickle,
)

DATA_DIR = "/root/reference/data/simulation"
DATASETS = {
    "low_freq": "sim_illustration_low_freq.pickle",
    "high_freq": "sim_illustration_high_freq.pickle",
    "varying_freq": "sim_illustration_varying_freq.pickle",
}

# GPy numbers from the reference's committed notebook outputs (BASELINE.md)
REFERENCE = {
    ("low_freq", "IGPR"): (2.247, 2.178, 0.835),
    ("low_freq", "ICM"): (2.263, 2.179, 0.835),
    ("high_freq", "IGPR"): (1.507, 3.170, 0.915),
    ("high_freq", "ICM"): (1.520, 3.169, 0.910),
    ("varying_freq", "IGPR"): (1.640, 3.185, 0.875),
    ("varying_freq", "ICM"): (1.660, 3.164, 0.880),
}


def metrics(means, stds, Yt_list):
    mu = np.concatenate([np.asarray(m).reshape(-1) for m in means])
    sd = np.concatenate([np.asarray(s).reshape(-1) for s in stds])
    yt = np.concatenate([np.asarray(y).reshape(-1) for y in Yt_list])
    lo, hi = mu - 1.959963984540054 * sd, mu + 1.959963984540054 * sd
    rmse = float(np.sqrt(np.mean((mu - yt) ** 2)))
    length = float(np.mean(hi - lo))
    coverage = float(np.mean((yt >= lo) & (yt <= hi)))
    return rmse, length, coverage


def main():
    rows = []
    for name, fname in DATASETS.items():
        X_list, Y_list, Xt_list, Yt_list = load_sim_pickle(os.path.join(DATA_DIR, fname))

        m = fit_igpr(X_list, Y_list, kernel="exponential", steps=2000, lr=0.02)
        rmse, length, cov = metrics(*predict_igpr(m, Xt_list), Yt_list)
        ref = REFERENCE[(name, "IGPR")]
        rows.append(
            {"dataset": name, "model": "IGPR", "rmse": rmse, "ci_length": length,
             "coverage": cov, "ref_rmse": ref[0], "ref_ci_length": ref[1],
             "ref_coverage": ref[2]}
        )
        print(rows[-1])

        mi = fit_icm(X_list, Y_list, rank=1, kernel="exponential", steps=3000, lr=0.02)
        rmse, length, cov = metrics(*predict_icm(mi, Xt_list), Yt_list)
        ref = REFERENCE[(name, "ICM")]
        rows.append(
            {"dataset": name, "model": "ICM", "rmse": rmse, "ci_length": length,
             "coverage": cov, "ref_rmse": ref[0], "ref_ci_length": ref[1],
             "ref_coverage": ref[2]}
        )
        print(rows[-1])

    os.makedirs("results", exist_ok=True)
    with open("results/baseline_parity.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote results/baseline_parity.json")


if __name__ == "__main__":
    main()
