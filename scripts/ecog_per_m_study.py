"""ECoG held-out-channel prediction study across inducing-point counts.

Replicates the reference's NMGP_ECoG_pred.py per-M study design: for each
M, train the D=78 CNMGP on the ECoG workload with 20% of the last channel
held out (create_datasets split, NMGP_ECoG_pred.py:24-51), then report
held-out RMSE / CI length / coverage per M.

Protocol (reference NMGP_ECoG_pred.py:311-470): B=512, lr=0.005,
hyperpars {ls_L0_log: 10, ls_L1_log: 10, **ls_tildeell_log: 2**,
sigma2_err_log: -5}, initpars mu_v=1.  NB the reference's live per-M
blocks (M=50 :326, M=100 :398, M=200 :464) all use ls_tildeell_log=2 —
the "5" variant is commented out — and its M=25 block (:254-262) is dead
legacy code (calls CNMGP with a pre-refactor positional signature that
would crash), so M=25 here runs under the same protocol as the others.
Round 4 ran this study with ls_tildeell_log=5 (the ECoG_full value) and
hit a reproducible accuracy dip at M=50 — the round-5 diagnosis
(docs/DESIGN.md §16) traces it to that hyperparameter, hence the
--ls-tildeell-log knob for the A/B.

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


def loss_diagnostics(loss_list):
    """Basin diagnostics on a loss trace (same rules as run_workload.py)."""
    la = np.asarray(loss_list, dtype=np.float64)
    if np.all(~np.isfinite(la)):
        return dict(loss_min=float("nan"), loss_argmin=-1,
                    first_nonfinite_step=0, first_blowup_step=-1)
    argmin = int(np.nanargmin(la))
    bad = np.where(~np.isfinite(la))[0]
    blow = np.where(la[argmin:] > 10.0 * abs(float(np.nanmin(la))))[0]
    return dict(
        loss_min=float(np.nanmin(la)),
        loss_argmin=argmin,
        first_nonfinite_step=int(bad[0]) if bad.size else -1,
        first_blowup_step=int(argmin + blow[0]) if blow.size else -1,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--Ms", type=int, nargs="+", default=[25, 50, 100, 128, 200])
    p.add_argument("--itnum", type=int, default=50)
    p.add_argument("--batchsize", type=int, default=512)
    p.add_argument("--n-sample", type=int, default=200)
    p.add_argument("--seeds", type=int, nargs="+", default=[22])
    p.add_argument("--ls-tildeell-log", type=float, default=2.0,
                   help="frozen log length-scale of the tilde_ell prior; "
                        "the reference per-M study uses 2 "
                        "(NMGP_ECoG_pred.py:326,398,464); 5 is the "
                        "ECoG_full value that round 4 mistakenly used here")
    p.add_argument("--grad-clip", type=float, default=1000.0,
                   help="global-norm gradient clip, matching the real-data "
                        "driver default (run_workload.py): the M=50 config "
                        "exhibits the docs/DESIGN.md §15 late-training loss "
                        "escape on some seeds without it (0 disables)")
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
    X_list, Y_list, Xt_list, Yt_list = etl.ecog_pred_split(X_list, Y_list)
    Xt, Yt = Xt_list[-1], Yt_list[-1]
    D = len(X_list)
    t_max = float(max(np.max(np.ravel(v)) for v in X_list))
    n_train = sum(len(np.ravel(v)) for v in X_list)

    hyperpars = {
        "length_scales_L0_log": 10, "length_scales_L1_log": 10,
        "length_scales_tildeell_log": args.ls_tildeell_log,
        "sigma2_err_log": -5,
    }

    rows = []
    for M in args.Ms:
        for seed in args.seeds:
            z = np.linspace(0, t_max, M)
            t0 = time.time()
            res = inference(
                X_list, Y_list, z, batch_size=args.batchsize, dim_outputs=D,
                lr=0.005, itnum=args.itnum, hyperpars=hyperpars,
                fix_hyperpars=True, mu_v=np.ones(M), seed=seed,
                show_ELBO=False,
                grad_clip_norm=args.grad_clip if args.grad_clip else None,
            )
            train_s = time.time() - t0
            ys, _, _, _ = sample_Y(
                res.params, res.Z, [np.ravel(Xt)], index=[D - 1],
                n_sample=args.n_sample, seed=seed,
            )
            rmse, ci, cov = predictive_summary(ys, np.ravel(Yt))
            row = dict(
                M=M, D=D, N=n_train, itnum=args.itnum, seed=seed,
                ls_tildeell_log=args.ls_tildeell_log,
                grad_clip=float(args.grad_clip),
                rmse_test=float(rmse), ci_length=float(ci),
                coverage=float(np.mean(cov)),
                steps_per_s=len(res.loss_list) / train_s,
                train_s=train_s, final_loss=float(res.loss_list[-1]),
                **loss_diagnostics(res.loss_list),
            )
            rows.append(row)
            print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
