"""Round-5 chip batch D: final validation sweep.

  bench_final — the committed bench.py (400-epoch dispatches) on chip:
                the number the driver will record as BENCH_r05
  sim3        — 3-seed sim parity spot check under round-5 code (both KL
                modes; the "parity unchanged" clause of VERDICT item 5)
  spatial     — ECoG spatial correlation analysis refresh on round-5 code
                (direction/distance curves + figures)

Usage: python scripts/chip_batch_r5d.py [--skip s ...] [--only s ...]
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


@step_def("bench_final")
def _bench_final():
    rec = last_json_line(run_script("bench.py", []))
    rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open("results/bench_tpu_r5.json", "w") as f:
        json.dump(rec, f)


@step_def("sim3")
def _sim3():
    for mode in ("true", "ref_compat"):
        run_script(
            "scripts/sim_parity.py",
            ["--data", "sim_illustration_low_freq", "--M", "20",
             "--itnum", "2000", "--kl-mode", mode,
             "--seeds", "0", "1", "2",
             "--out", f"results/sim_low_freq_3seed_r5_{mode}.json"],
        )


@step_def("spatial")
def _spatial():
    run_script(
        "scripts/run_workload.py",
        ["ecog", "--M", "100", "--itnum", "50", "--spatial-analysis",
         "--out", "results/workload_ecog_spatial_r5.json"],
    )


ORDER = ["bench_final", "sim3", "spatial"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", nargs="*", default=[])
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    os.makedirs("results/figs", exist_ok=True)
    step, status = make_stepper("results/chip_batch_r5d_status.json")
    for name in ORDER:
        if args.only is not None and name not in args.only:
            continue
        if name in args.skip:
            continue
        step(name, STEPS[name])
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
