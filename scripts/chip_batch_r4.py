"""Round-4 chip batch #1: every TPU measurement in ONE process / ONE grant.

The axon grant costs minutes per process acquisition, so all chip jobs run
sequentially inside this single process via runpy (shared backend claim,
shared compile cache).  Steps are ordered most-valuable-first and each is
wrapped so one failure doesn't lose the rest (helpers in
scripts/_chip_batch_util.py).

Usage: python scripts/chip_batch_r4.py [--skip step ...] [--only step ...]
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


@step_def("bench")
def _bench():
    rec = last_json_line(run_script("bench.py", []))
    rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open("results/bench_tpu_r4.json", "w") as f:
        json.dump(rec, f)


@step_def("ecog_ab")
def _ecog_ab():
    for flag, name in ((False, "f32"), (True, "bf16")):
        argv = ["--M", "100", "--B", "512"] + (["--bf16"] if flag else [])
        rec = last_json_line(run_script("scripts/bench_ecog.py", argv))
        rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(f"results/bench_ecog_tpu_r4_{name}.json", "w") as f:
            json.dump(rec, f)


@step_def("sim_parity")
def _sim_parity():
    seeds = [str(s) for s in range(10)]
    for data in ("sim_illustration_low_freq", "sim_illustration_high_freq",
                 "sim_illustration_varying_freq"):
        short = data.replace("sim_illustration_", "")
        for mode in ("ref_compat", "true"):
            run_script(
                "scripts/sim_parity.py",
                ["--data", data, "--M", "20", "--itnum", "2000",
                 "--kl-mode", mode, "--seeds"] + seeds +
                ["--out", f"results/sim_{short}_10seed_2000ep_r4_{mode}.json"] +
                (["--plots-dir", "results/figs"] if short == "low_freq" else []),
            )


@step_def("ecog_per_m")
def _ecog_per_m():
    run_script("scripts/ecog_per_m_study.py",
               ["--out", "results/ecog_per_m_rmse.json"])


@step_def("hcp")
def _hcp():
    run_script("scripts/run_workload.py",
               ["hcp", "--out", "results/workload_hcp_tpu_r4.json"])


@step_def("smc")
def _smc():
    run_script("scripts/run_model_comparison.py",
               ["--particles", "2048",
                "--out", "results/smc_model_comparison_tpu.json"])


@step_def("nuts_multichain")
def _nuts_multichain():
    # NB: as originally run this step also attempted 256 chains x 25-iter
    # segments, which CRASHED the TPU worker (docs/DESIGN.md §13).  The
    # conservative 128-chain x 8-iter retry lives in chip_batch_r4b.py;
    # this re-runnable version keeps only the safe 64-chain configuration.
    rows = []
    for chains in ("64",):
        run_script(
            "scripts/run_mcmc_sim.py",
            ["--N", "100", "--chains", chains, "--warmup", "200",
             "--samples", "200", "--sampler", "nuts", "--segment-iters", "25",
             "--out", f"results/nuts_{chains}chain_tpu.json",
             "--plots-dir", "results/figs" if chains == "64" else "results/figs_256"],
        )
        with open(f"results/nuts_{chains}chain_tpu.json") as f:
            rows.append(json.load(f))
    with open("results/nuts_multichain_tpu.json", "w") as f:
        json.dump(rows, f, indent=2)


ORDER = ["bench", "ecog_ab", "sim_parity", "ecog_per_m", "hcp", "smc",
         "nuts_multichain"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", nargs="*", default=[])
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    os.makedirs("results/figs", exist_ok=True)
    step, status = make_stepper("results/chip_batch_r4_status.json")
    for name in ORDER:
        if args.only is not None and name not in args.only:
            continue
        if name in args.skip:
            continue
        step(name, STEPS[name])
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
