"""Batch-size study: RMSE-vs-wallclock traces at B in {1000, 2000, 5000}.

Replicates the reference's committed batch-size experiment — the
`train_trace_BS_{PM25,HCP}.png` figures:

  - PM25 sub: M=100, lr=0.01, itnum=50 (B=1000/2000) and itnum=100
    (B=5000) — reference NMGP_PM25.py:219-263
  - HCP: M=100, lr=0.01, itnum=50 — reference NMGP_HCP.py:236-258

The reference records test RMSE after EVERY optimizer step (`do_test`,
nmgp_dsvi.py:865-868), serializing a predict into the hot loop.  On TPU we
keep the scan fast path and sample the trace at dispatch boundaries
(`inference(chunked_test_trace=True)`, every DISPATCH_BUDGET_S seconds) —
the RMSE-vs-seconds curve is the deliverable and only needs O(seconds)
resolution.

Run (chip): python scripts/bs_study.py pm25|hcp [--out ...]
Writes results/bs_study_<wl>.json + results/figs/train_trace_BS_<WL>.png.
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

CFG = {
    # (batch_size, itnum) pairs straight from the reference drivers
    "pm25": dict(
        M=100, lr=0.01, runs=[(1000, 50), (2000, 50), (5000, 100)],
        hyperpars={"length_scales_L0_log": 10, "length_scales_L1_log": 10,
                   "length_scales_tildeell_log": 10},
    ),
    "hcp": dict(
        M=100, lr=0.01, runs=[(1000, 50), (2000, 50), (5000, 50)],
        hyperpars={"length_scales_L0_log": 5, "length_scales_L1_log": 5,
                   "length_scales_tildeell_log": 5},
    ),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("workload", choices=sorted(CFG))
    p.add_argument("--itnum-scale", type=float, default=1.0,
                   help="scale every run's epoch count (quick smoke: 0.1)")
    p.add_argument("--seed", type=int, default=22)
    p.add_argument("--grad-clip", type=float, default=1000.0,
                   help="global-norm grad clip (driver default; the "
                        "unclipped B=1000 legs escape their loss basin "
                        "within 50 epochs — batch-A artifacts); 0 disables "
                        "to reproduce the reference's unguarded traces")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        inference,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils import etl

    cfg = CFG[args.workload]
    if args.workload == "pm25":
        X_list, Y_list, Xt_list, Yt_list = etl.synthetic_pm25()
    else:
        X_list, Y_list, Xt_list, Yt_list = etl.synthetic_hcp()
    D = len(X_list)
    t_max = max(float(np.max(np.ravel(v))) for v in X_list)
    z = np.linspace(0, t_max, cfg["M"])
    n_train = sum(len(np.ravel(v)) for v in X_list)

    traces = []
    for B, itnum in cfg["runs"]:
        itnum = max(int(round(itnum * args.itnum_scale)), 3)
        t0 = time.time()
        res = inference(
            X_list, Y_list, z, batch_size=B, dim_outputs=D,
            lr=cfg["lr"], itnum=itnum, hyperpars=cfg["hyperpars"],
            fix_hyperpars=True, mu_v=np.ones(cfg["M"]), seed=args.seed,
            show_ELBO=False,
            grad_clip_norm=args.grad_clip if args.grad_clip else None,
            X_test_list=Xt_list, Y_test_list=Yt_list,
            chunked_test_trace=True,
        )
        train_s = time.time() - t0
        tr = dict(
            batch_size=B, itnum=itnum,
            steps=len(res.loss_list), train_s=train_s,
            steps_per_s=len(res.loss_list) / train_s,
            final_loss=float(res.loss_list[-1]),
            rmse_final=float(res.rmse_trace[-1][2]) if res.rmse_trace else None,
            trace=[dict(wall_s=float(w), epochs=int(e), rmse=float(r))
                   for (w, e, r) in res.rmse_trace],
        )
        traces.append(tr)
        print(json.dumps({k: v for k, v in tr.items() if k != "trace"}))

    out_path = args.out or f"results/bs_study_{args.workload}.json"
    payload = dict(
        workload=args.workload, D=D, N=n_train, M=cfg["M"], lr=cfg["lr"],
        seed=args.seed, grad_clip=float(args.grad_clip), runs=traces,
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", out_path)

    # figure in the reference's format (NMGP_PM25.py:251-263)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    for tr in traces:
        w = [p["wall_s"] for p in tr["trace"]]
        r = [p["rmse"] for p in tr["trace"]]
        plt.plot(w, r, label=f"BS={tr['batch_size']}")
    plt.xlabel("Time (second)", fontsize=22)
    plt.ylabel("RMSE", fontsize=22)
    plt.legend(fontsize=16)
    plt.tight_layout()
    os.makedirs("results/figs", exist_ok=True)
    fig_path = f"results/figs/train_trace_BS_{args.workload.upper()}.png"
    plt.savefig(fig_path)
    plt.close(fig)
    print("wrote", fig_path)


if __name__ == "__main__":
    main()
