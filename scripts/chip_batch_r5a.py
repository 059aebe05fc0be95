"""Round-5 chip batch A: diagnosis + study runs that need no new kernels.

One process / one grant (scripts/_chip_batch_util.py pattern).  Steps,
most-valuable-first:

  per_m_diag   — M=50 ls_tildeell A/B: the round-4 per-M study used
                 ls_tildeell_log=5 where the reference per-M protocol
                 uses 2 (NMGP_ECoG_pred.py:326) — suspected root cause of
                 the M=50 accuracy dip (VERDICT r4 weak #1)
  per_m        — full per-M table, reference protocol, 2 seeds
  ecog_m200    — M=200 cold start at driver defaults, 50 epochs, no
                 checkpoint: stability (VERDICT weak #2) + clean
                 throughput number (weak #5)
  ecog_m200_ck — short M=200 run WITH checkpointing: measures ckpt IO
                 seconds to explain the 4.3 vs 21 steps/s artifact gap
  bs_pm25/hcp  — the reference's batch-size study traces + figures
                 (VERDICT missing #1)
  pm25_full    — PM25-full long run with clip+decay for nominal coverage
                 (VERDICT weak #3)

Usage: python scripts/chip_batch_r5a.py [--skip s ...] [--only s ...]
"""

import argparse
import json
import os

from _chip_batch_util import make_stepper, run_script, setup_batch_env

setup_batch_env()

STEPS = {}


def step_def(name):
    def deco(fn):
        STEPS[name] = fn
        return fn

    return deco


@step_def("per_m_diag")
def _per_m_diag():
    for ls in ("2", "5"):
        run_script(
            "scripts/ecog_per_m_study.py",
            ["--Ms", "50", "--seeds", "22", "--ls-tildeell-log", ls,
             "--out", f"results/ecog_per_m_m50_ls{ls}_r5.json"],
        )


@step_def("per_m")
def _per_m():
    run_script(
        "scripts/ecog_per_m_study.py",
        ["--seeds", "22", "23",
         "--out", "results/ecog_per_m_rmse_r5.json"],
    )


@step_def("ecog_m200")
def _ecog_m200():
    run_script(
        "scripts/run_workload.py",
        ["ecog", "--M", "200", "--itnum", "50",
         "--out", "results/workload_ecog_m200_tpu_r5_cold.json"],
    )


@step_def("ecog_m200_ck")
def _ecog_m200_ck():
    run_script(
        "scripts/run_workload.py",
        ["ecog", "--M", "200", "--itnum", "5",
         "--checkpoint", "results/ckpt_ecog_m200_r5.pkl",
         "--out", "results/workload_ecog_m200_tpu_r5_ckpt_probe.json"],
    )
    # and a resumed leg: measures the LOAD side of the IO gap too
    run_script(
        "scripts/run_workload.py",
        ["ecog", "--M", "200", "--itnum", "5", "--resume",
         "--checkpoint", "results/ckpt_ecog_m200_r5.pkl",
         "--out", "results/workload_ecog_m200_tpu_r5_ckpt_resume.json"],
    )


@step_def("bs_pm25")
def _bs_pm25():
    run_script("scripts/bs_study.py", ["pm25"])


@step_def("bs_hcp")
def _bs_hcp():
    run_script("scripts/bs_study.py", ["hcp"])


@step_def("pm25_full")
def _pm25_full():
    run_script(
        "scripts/run_workload.py",
        ["pm25", "--full", "--itnum", "200", "--lr-decay", "0.99",
         "--out", "results/workload_pm25_full_tpu_r5.json"],
    )


ORDER = ["per_m_diag", "per_m", "ecog_m200", "ecog_m200_ck",
         "bs_pm25", "bs_hcp", "pm25_full"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", nargs="*", default=[])
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    os.makedirs("results/figs", exist_ok=True)
    step, status = make_stepper("results/chip_batch_r5a_status.json")
    for name in ORDER:
        if args.only is not None and name not in args.only:
            continue
        if name in args.skip:
            continue
        step(name, STEPS[name])
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
