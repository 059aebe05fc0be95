"""Real-data workload driver: PM2.5 / HCP / ECoG / simulation.

Replaces the reference's per-dataset driver scripts (NMGP_PM25.py,
NMGP_HCP.py, NMGP_ECoG_full.py, NMGP_ECoG_pred.py) with one CLI.
Per-workload configurations follow the reference exactly
(SURVEY.md §2.3 #28-31):

  pm25: M=100, B in {1000,2000,5000}, lr=0.01, hyperpars ls_*=10, mu_v=1
  hcp:  M=100, B in {1000,2000,5000}, lr=0.01, itnum=50, hyperpars ls_*=5
  ecog: M in {25,50,100,200}, B=512, lr=0.005,
        hyperpars {ls_L0:10, ls_L1:10, ls_te:5, s2e_log:-5}

Raw data is private (not shipped with the reference either); pass --data-path
to a compatible pickle, else a same-shape synthetic surrogate is used.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
import json
import pickle
import time

import jax.numpy as jnp
import numpy as np

WORKLOADS = {
    "pm25": dict(
        M=100, lr=0.01, itnum=100, batch_sizes=(1000, 2000, 5000),
        hyperpars={"length_scales_L0_log": 10, "length_scales_L1_log": 10,
                   "length_scales_tildeell_log": 10},
        mu_v_init=1.0,
    ),
    "hcp": dict(
        M=100, lr=0.01, itnum=50, batch_sizes=(1000, 2000, 5000),
        hyperpars={"length_scales_L0_log": 5, "length_scales_L1_log": 5,
                   "length_scales_tildeell_log": 5},
        mu_v_init=1.0,
    ),
    "ecog": dict(
        M=100, lr=0.005, itnum=50, batch_sizes=(512,),
        hyperpars={"length_scales_L0_log": 10, "length_scales_L1_log": 10,
                   "length_scales_tildeell_log": 5, "sigma2_err_log": -5},
        mu_v_init=1.0,
    ),
}


def load_data(name, data_path, full=False):
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils import etl

    if data_path:
        # raw notebook inputs (Beijing CSV / HCP txt / Hilbert pickle) or a
        # pre-split [X, Y, Xt, Yt] pickle — etl.load_workload_data sniffs
        return (*etl.load_workload_data(name, data_path, full=full), "real")
    if name == "pm25":
        return (*etl.synthetic_pm25(full=full), "synthetic-full" if full else "synthetic")
    if name == "hcp":
        return (*etl.synthetic_hcp(), "synthetic")
    if name == "ecog":
        # held-out 20% of the last channel (NMGP_ECoG_pred.py:24-51 protocol)
        X_list, Y_list = etl.synthetic_ecog()
        return (*etl.ecog_pred_split(X_list, Y_list), "synthetic")
    raise ValueError(name)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("workload", choices=sorted(WORKLOADS))
    p.add_argument("--data-path", default=None)
    p.add_argument("--M", type=int, default=None)
    p.add_argument("--batchsize", type=int, default=None)
    p.add_argument("--itnum", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=22)
    p.add_argument("--kl-mode", default="true", choices=["true", "ref_compat"])
    p.add_argument("--lr-decay", type=float, default=None,
                   help="per-epoch exponential lr decay (e.g. 0.99)")
    p.add_argument("--grad-clip", type=float, default=1000.0,
                   help="global-norm gradient clip for the real-data "
                        "drivers (0 disables).  Bounds the slow "
                        "destabilization observed on 200-epoch HCP runs "
                        "(docs/DESIGN.md §15); inactive on healthy steps")
    p.add_argument("--auto-rollback", action="store_true",
                   help="divergence rollback: on a non-finite or "
                        "basin-escaping dispatch chunk, restore the "
                        "pre-chunk state and retry at half the lr "
                        "(inference(divergence_rollback=True); "
                        "incompatible with --lr-decay)")
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "adam_bf16"],
                   help="adam_bf16 stores both Adam moments in bf16 "
                        "(f32 compute; +6%% measured ECoG step rate, "
                        "infer/optimizers.py)")
    p.add_argument("--n-sample", type=int, default=200)
    p.add_argument("--out", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--ckpt-bf16-moments", action="store_true",
                   help="save Adam moments bf16 (halves the dominant "
                   "axon-tunnel fetch of a large-state save; "
                   "docs/DESIGN.md §17.3)")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--full",
        action="store_true",
        help="pm25: full-dataset shape (302,537 train / 10,077 test; "
        "reference notebook/PM25.ipynb cell 5) instead of the sub shape",
    )
    p.add_argument(
        "--spatial-analysis",
        action="store_true",
        help="ECoG only: electrode-grid direction/distance correlation "
        "analysis of the inferred correlation process "
        "(reference NMGP_ECoG_full.py:456-546)",
    )
    p.add_argument(
        "--spatial-grid-points",
        type=int,
        default=200,
        help="time-grid resolution for the spatial correlation analysis",
    )
    p.add_argument(
        "--channel-indexes-path",
        default=None,
        help="pickle of electrode IDs per output (real data); default: "
        "deterministic surrogate containing the 5x5 analysis grid",
    )
    args = p.parse_args()

    cfg = WORKLOADS[args.workload]
    M = args.M or cfg["M"]
    lr = args.lr or cfg["lr"]
    itnum = args.itnum or cfg["itnum"]
    batch_size = args.batchsize or cfg["batch_sizes"][0]

    X_list, Y_list, Xt_list, Yt_list, source = load_data(
        args.workload, args.data_path, full=args.full
    )
    D = len(X_list)
    t_max = max(float(np.max(np.concatenate([np.ravel(v) for v in X_list if len(v)]))), 1.0)
    z = np.linspace(0, t_max, M)
    n_train = sum(len(np.ravel(v)) for v in X_list)
    print(f"# {args.workload} ({source}): D={D}, N={n_train}, M={M}, B={batch_size}")

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        inference,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.predict import (
        sample_Y,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.metrics import (
        predictive_summary,
    )

    if args.kl_mode == "ref_compat" and args.grad_clip:
        # the reference has no gradient clipping: a ref_compat run meant as
        # trajectory-exact reproduction should disable it (--grad-clip 0)
        print(
            "# WARNING: --kl-mode ref_compat with grad clip "
            f"{args.grad_clip} — the reference clips nothing; pass "
            "--grad-clip 0 for trajectory-exact reproduction"
        )

    t0 = time.time()
    res = inference(
        X_list,
        Y_list,
        z,
        batch_size=batch_size,
        dim_outputs=D,
        lr=lr,
        itnum=itnum,
        hyperpars=cfg["hyperpars"],
        fix_hyperpars=True,
        mu_v=cfg["mu_v_init"] * np.ones(M),
        seed=args.seed,
        show_ELBO=False,
        PATH=args.checkpoint,
        continuous_training=args.resume,
        save_model=args.checkpoint is not None,
        kl_mode=args.kl_mode,
        grad_clip_norm=args.grad_clip if args.grad_clip else None,
        lr_decay=args.lr_decay,
        divergence_rollback=args.auto_rollback,
        optimizer=args.optimizer,
        ckpt_moments_dtype=jnp.bfloat16 if args.ckpt_bf16_moments else None,
    )
    train_s = time.time() - t0
    steps = len(res.loss_list)
    out = dict(
        workload=args.workload,
        source=source,
        kl_mode=args.kl_mode,
        D=D,
        N=n_train,
        M=M,
        batch_size=batch_size,
        itnum=itnum,
        grad_clip=float(args.grad_clip),
        ckpt_bf16_moments=bool(args.ckpt_bf16_moments),
        lr_decay=args.lr_decay,
        rollbacks=res.rollbacks,
        final_loss=float(res.loss_list[-1]),
        steps_per_s=steps / train_s,
        train_s=train_s,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.checkpoint import (
        LAST_IO_SECONDS,
    )

    if args.checkpoint:
        # checkpoint IO through the axon tunnel is O(state size) and at
        # M=200 rivals training time (the round-4 4.3 vs 21 steps/s gap);
        # surface it so steps_per_s artifacts are interpretable
        out["ckpt_load_s"] = LAST_IO_SECONDS["load"]
        out["ckpt_save_s"] = LAST_IO_SECONDS["save"]
    # divergence diagnostics: where (if anywhere) the loss left its basin
    la = np.asarray(res.loss_list, dtype=np.float64)
    if np.all(~np.isfinite(la)):  # all-NaN run must still produce the artifact
        out["loss_min"] = float("nan")
        out["loss_argmin"] = -1
        out["first_nonfinite_step"] = 0
        out["first_blowup_step"] = -1
    else:
        out["loss_min"] = float(np.nanmin(la))
        out["loss_argmin"] = int(np.nanargmin(la))
        bad = np.where(~np.isfinite(la))[0]
        out["first_nonfinite_step"] = int(bad[0]) if bad.size else -1
        # a blowup is an exit from the loss basin, so only look AFTER the
        # minimum — the initial loss legitimately starts far above it
        argmin = int(np.nanargmin(la))
        blow = np.where(la[argmin:] > 10.0 * abs(float(np.nanmin(la))))[0]
        out["first_blowup_step"] = int(argmin + blow[0]) if blow.size else -1

    has_test = any(len(np.ravel(v)) for v in Xt_list)
    if has_test:
        Xt = [np.ravel(v) for v in Xt_list]
        Yt = [np.ravel(v) for v in Yt_list]
        keep = [i for i in range(D) if len(Xt[i])]
        ys, _, _, _ = sample_Y(
            res.params,
            res.Z,
            [Xt[i] for i in keep],
            index=keep,
            n_sample=args.n_sample,
            seed=args.seed,
            kl_mode=args.kl_mode,
        )
        y_test = np.concatenate([Yt[i] for i in keep])
        rmse, ci, cov = predictive_summary(ys, y_test)
        out.update(rmse_test=float(rmse), ci_length=float(ci), coverage=float(np.mean(cov)))

    if args.spatial_analysis:
        if args.workload != "ecog":
            raise SystemExit("--spatial-analysis is an ECoG workload analysis")
        from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.predict import (
            sample_FY,
        )
        from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils import (
            etl,
        )
        from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.posterior_analysis import (
            ECOG_GRID_CHANNEL_IDS,
            direction_correlation_curves,
            distance_correlation_curves,
            plot_spatial_correlation,
        )

        if args.channel_indexes_path:
            with open(args.channel_indexes_path, "rb") as f:
                channel_indexes = np.asarray(pickle.load(f))
        else:
            channel_indexes = etl.surrogate_ecog_channel_indexes(D)

        grids = np.linspace(0.0, t_max, args.spatial_grid_points)
        # posterior-mean correlation process on the grid: mean over sample_FY
        # draws of the per-point corr matrices (reference est_corrs_train,
        # NMGP_ECoG_full.py:321-339)
        _, _, corrs = sample_FY(
            res.params, res.Z, grids, n_sample=args.n_sample, seed=args.seed,
            kl_mode=args.kl_mode,
        )
        est_corrs = corrs.mean(axis=0)  # (G, D, D)
        direction = direction_correlation_curves(
            est_corrs, ECOG_GRID_CHANNEL_IDS, channel_indexes
        )
        distance = distance_correlation_curves(
            est_corrs, ECOG_GRID_CHANNEL_IDS, channel_indexes
        )
        save_dir = os.path.dirname(args.out) if args.out else "results"
        p_dir, p_dist = plot_spatial_correlation(grids, direction, distance, save_dir)
        out["spatial_analysis"] = {
            "grid_points": int(args.spatial_grid_points),
            "direction_mean": {k: float(np.mean(v)) for k, v in direction.items()},
            "direction_curves": {k: v.tolist() for k, v in direction.items()},
            "distance_mean": {str(k): float(np.mean(v)) for k, v in distance.items()},
            "distance_curves": {str(k): v.tolist() for k, v in distance.items()},
            "figures": [p_dir, p_dist],
        }

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
