"""ECoG held-out-channel prediction study across inducing-point counts.

Replicates the reference's NMGP_ECoG_pred.py:368-506 study design: for each
M in {25, 50, 100, 200}, train the D=78 CNMGP on the ECoG workload with 20%
of the last channel held out (create_datasets split, NMGP_ECoG_pred.py:24-51),
then report held-out RMSE / CI length / coverage per M.

Adds M=128 beyond the reference grid: on TPU the (G, M, M) blocks tile the
128-lane MXU exactly, so M=128 costs the same wall-clock as M=100 while
buying 28% more inducing capacity — the table records both statistical and
throughput evidence for that design point.

One process, sequential Ms (serial TPU discipline).  Run:
    python scripts/ecog_per_m_study.py [--itnum 50] [--cpu]
Writes results/ecog_per_m_rmse.json.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--Ms", type=int, nargs="+", default=[25, 50, 100, 128, 200])
    p.add_argument("--itnum", type=int, default=50)
    p.add_argument("--batchsize", type=int, default=512)
    p.add_argument("--n-sample", type=int, default=200)
    p.add_argument("--seed", type=int, default=22)
    p.add_argument("--out", default="results/ecog_per_m_rmse.json")
    args = p.parse_args()

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        inference,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.predict import (
        sample_Y,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils import etl
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.metrics import (
        predictive_summary,
    )

    # NMGP_ECoG_pred protocol: hold out 20% of the last channel
    X_list, Y_list = etl.synthetic_ecog()
    rng = np.random.RandomState(22)
    x_last, y_last = X_list[-1], Y_list[-1]
    te = np.sort(rng.choice(len(x_last), len(x_last) // 5, replace=False))
    tr = np.setdiff1d(np.arange(len(x_last)), te)
    Xt, Yt = x_last[te], y_last[te]
    X_list = X_list[:-1] + [x_last[tr]]
    Y_list = Y_list[:-1] + [y_last[tr]]
    D = len(X_list)
    t_max = float(max(np.max(np.ravel(v)) for v in X_list))
    n_train = sum(len(np.ravel(v)) for v in X_list)

    hyperpars = {
        "length_scales_L0_log": 10, "length_scales_L1_log": 10,
        "length_scales_tildeell_log": 5, "sigma2_err_log": -5,
    }

    rows = []
    for M in args.Ms:
        z = np.linspace(0, t_max, M)
        t0 = time.time()
        res = inference(
            X_list, Y_list, z, batch_size=args.batchsize, dim_outputs=D,
            lr=0.005, itnum=args.itnum, hyperpars=hyperpars,
            fix_hyperpars=True, mu_v=np.ones(M), seed=args.seed,
            show_ELBO=False,
        )
        train_s = time.time() - t0
        ys, _, _, _ = sample_Y(
            res.params, res.Z, [np.ravel(Xt)], index=[D - 1],
            n_sample=args.n_sample, seed=args.seed,
        )
        rmse, ci, cov = predictive_summary(ys, np.ravel(Yt))
        row = dict(
            M=M, D=D, N=n_train, itnum=args.itnum,
            rmse_test=float(rmse), ci_length=float(ci),
            coverage=float(np.mean(cov)),
            steps_per_s=len(res.loss_list) / train_s,
            train_s=train_s, final_loss=float(res.loss_list[-1]),
        )
        rows.append(row)
        print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
