"""Simulation parity harness: replicates the reference NMGP_SIM experiment.

Reference protocol (code/notebook/NMGP_SIM.ipynb cells 1-7): M=20 inducing
points, full batch, lr=0.005, 2000 epochs, length-scale logs frozen at
{tildeell: 0, L0: 2, L1: 2}, sigma2 logs {tildeell: 0, L0: 0, L1: 0},
sigma2_err_log=-2; then 1000 posterior draws on train/test/grids and
RMSE / 95%-CI length / coverage (nmgp_dsvi.py:1050-1068).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

if "--cpu" in sys.argv:
    # NOTE: env JAX_PLATFORMS=cpu does NOT work on this image (the TPU
    # plugin registers at interpreter startup); lazy config update does.
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
if "--x64" in sys.argv:
    sys.argv.remove("--x64")
    import jax

    jax.config.update("jax_enable_x64", True)
import json
import sys
import time

import numpy as np

from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import inference
from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.predict import sample_Y
from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.data import load_sim_pickle
from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.metrics import predictive_summary

HYPERPARS = {
    "sigma2_L0_log": 0, "length_scales_L0_log": 2,
    "sigma2_L1_log": 0, "length_scales_L1_log": 2,
    "sigma2_tildeell_log": 0, "length_scales_tildeell_log": 0,
    "sigma2_err_log": -2,
}


def run_seed(data, M, seed, itnum=2000, lr=0.005, n_sample=1000, kl_mode="true",
             plots_dir=None):
    X_list, Y_list, Xt_list, Yt_list = load_sim_pickle(
        f"/root/reference/data/simulation/{data}.pickle")
    z = np.linspace(0, 1, M)
    res = inference(X_list, Y_list, z, batch_size=0, dim_outputs=len(X_list),
                    lr=lr, itnum=itnum, hyperpars=HYPERPARS, fix_hyperpars=True,
                    seed=seed, show_ELBO=True, elbo_every=100, kl_mode=kl_mode)
    ys_test, _, _, _ = sample_Y(res.params, res.Z, Xt_list, n_sample=n_sample,
                                seed=seed, kl_mode=kl_mode)
    y_test = np.concatenate([np.asarray(y).reshape(-1) for y in Yt_list])
    test_index = np.concatenate(
        [np.full(len(np.asarray(x).reshape(-1)), d) for d, x in enumerate(Xt_list)])
    r, length, cov = predictive_summary(ys_test, y_test, test_index=test_index,
                                        dim_outputs=len(X_list))
    if plots_dir:
        # per-output posterior predictive bands on a 200-grid with the train
        # scatter (reference Plot_posterior / nmgp_dsvi.py driver figures)
        from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.visualization import (
            plot_posterior, samples2quantiles)
        D = len(X_list)
        grids = np.linspace(0, 1, 200)
        ys_g, _, _, _ = sample_Y(res.params, res.Z, [grids] * D,
                                 n_sample=n_sample, seed=seed, kl_mode=kl_mode)
        # (S, D*200) -> (200, S, D)
        pos = ys_g.reshape(ys_g.shape[0], D, 200).transpose(2, 0, 1)
        q = samples2quantiles(pos)
        x_tr = np.ravel(np.asarray(X_list[0]))
        Y_tr = np.stack([np.ravel(np.asarray(y)) for y in Y_list], axis=1)
        plot_posterior(x_tr, Y_tr, grids, q, save_dir=plots_dir,
                       attributes=[f"{data}_y{d + 1}_seed{seed}" for d in range(D)],
                       type=f"DSVI_{kl_mode}")
    return dict(seed=seed, rmse=r, ci_length=length, coverage=float(np.mean(cov)),
                elbo_trace=res.elbo_trace)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="sim_illustration_low_freq")
    p.add_argument("--M", type=int, default=20)
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--itnum", type=int, default=2000)
    p.add_argument("--kl-mode", default="true", choices=["true", "ref_compat"],
                   help="ref_compat reproduces the reference's KL quirk "
                        "(see ops/linalg.kl_gaussian_ref_compat)")
    p.add_argument("--out", default=None)
    p.add_argument("--plots-dir", default=None,
                   help="write posterior-band PNGs for the FIRST seed")
    a = p.parse_args()
    results = []
    for s in a.seeds:
        t0 = time.time()
        r = run_seed(a.data, a.M, s, itnum=a.itnum, kl_mode=a.kl_mode,
                     plots_dir=a.plots_dir if s == a.seeds[0] else None)
        r["wallclock_s"] = time.time() - t0
        print(json.dumps({k: v for k, v in r.items() if k != "elbo_trace"}))
        print("  elbo_trace tail:", r["elbo_trace"][-3:])
        results.append(r)
    rmses = np.array([r["rmse"] for r in results])
    lens = np.array([r["ci_length"] for r in results])
    covs = np.array([r["coverage"] for r in results])
    summary = dict(data=a.data, M=a.M, kl_mode=a.kl_mode, n_seeds=len(results),
                   rmse_mean=float(rmses.mean()), rmse_std=float(rmses.std()),
                   ci_mean=float(lens.mean()), cov_mean=float(covs.mean()))
    print(json.dumps(summary))
    if a.out:
        with open(a.out, "w") as f:
            json.dump({"summary": summary, "results": [
                {k: v for k, v in r.items()} for r in results]}, f)
