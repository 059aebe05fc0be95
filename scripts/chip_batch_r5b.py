"""Round-5 chip batch B: final per-M table + flagship/ECoG benches.

Runs after chip_batch_r5a (diagnosis batch).  Steps:

  per_m_final  — per-M table with the round-4 hyperparameter (ls=5) PLUS
                 the driver-default grad clip: batch A showed the M=50 dip
                 is a post-minimum loss escape (first_blowup_step 5750 at
                 ls=5 / 5670 at ls=2 seed 23), i.e. the docs/DESIGN.md §15
                 instability, not a conditioning wall.  2 seeds.
  bench        — flagship driver-path bench under round-5 code
  flagship_ab  — true vs ref_compat step timing at the bench shape
                 (isolates the r4 ~3% factor-op suspicion)
  ecog_opt_ab  — Adam vs bf16-moment Adam at M=100/B=512 (optimizer-HBM
                 lever, 38% of step) + the large-B headline configs
                 (B=1024/2048) that measured 9.3/9.8% MFU in round 3

Usage: python scripts/chip_batch_r5b.py [--skip s ...] [--only s ...]
"""

import argparse
import json
import os
import time

from _chip_batch_util import last_json_line, make_stepper, run_script, setup_batch_env

setup_batch_env()

STEPS = {}


def step_def(name):
    def deco(fn):
        STEPS[name] = fn
        return fn

    return deco


@step_def("per_m_final")
def _per_m_final():
    run_script(
        "scripts/ecog_per_m_study.py",
        ["--seeds", "22", "23", "--ls-tildeell-log", "5",
         "--out", "results/ecog_per_m_rmse_r5_ls5_clip.json"],
    )


@step_def("ecog_m200")
def _ecog_m200():
    # re-queued from batch A (failed there on a stale in-process module
    # after a mid-run edit, not on chip behavior)
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
    run_script(
        "scripts/run_workload.py",
        ["ecog", "--M", "200", "--itnum", "5", "--resume",
         "--checkpoint", "results/ckpt_ecog_m200_r5.pkl",
         "--out", "results/workload_ecog_m200_tpu_r5_ckpt_resume.json"],
    )


@step_def("bench")
def _bench():
    rec = last_json_line(run_script("bench.py", []))
    rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open("results/bench_tpu_r5.json", "w") as f:
        json.dump(rec, f)


@step_def("flagship_ab")
def _flagship_ab():
    run_script("scripts/bench_flagship_ab.py", [])


@step_def("bs_clip")
def _bs_clip():
    # clipped reruns of the batch-size study: the unclipped B=1000 legs
    # escape their basin within 50 epochs (results/bs_study_*_noclip.json)
    run_script("scripts/bs_study.py", ["pm25"])
    run_script("scripts/bs_study.py", ["hcp"])


@step_def("pm25_full")
def _pm25_full():
    run_script(
        "scripts/run_workload.py",
        ["pm25", "--full", "--itnum", "200", "--lr-decay", "0.99",
         "--out", "results/workload_pm25_full_tpu_r5.json"],
    )


@step_def("ecog_opt_ab")
def _ecog_opt_ab():
    for opt, B, name in (
        ("adam", "512", "adam_b512"),
        ("adam_bf16", "512", "adambf16_b512"),
        ("adam", "2048", "adam_b2048"),
        ("adam_bf16", "2048", "adambf16_b2048"),
        ("adam_bf16", "1024", "adambf16_b1024"),
    ):
        rec = last_json_line(
            run_script("scripts/bench_ecog.py",
                       ["--M", "100", "--B", B, "--optimizer", opt])
        )
        rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(f"results/bench_ecog_tpu_r5_{name}.json", "w") as f:
            json.dump(rec, f)


ORDER = ["per_m_final", "ecog_m200", "ecog_m200_ck", "bench", "flagship_ab",
         "ecog_opt_ab", "bs_clip", "pm25_full"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", nargs="*", default=[])
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    os.makedirs("results/figs", exist_ok=True)
    step, status = make_stepper("results/chip_batch_r5b_status.json")
    for name in ORDER:
        if args.only is not None and name not in args.only:
            continue
        if name in args.skip:
            continue
        step(name, STEPS[name])
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
