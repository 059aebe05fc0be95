"""Round-5 chip batch C: the large-chain NUTS artifacts (VERDICT r4 #6).

Runs after chip_batch_r5b.  The per-dispatch leapfrog budget is now
enforced IN CODE (config.SAMPLER_LEAPFROG_BUDGET; run_nuts_multichain
auto-sizes segments), so the 256-chain configuration that crashed the
round-4 worker now dispatches 6-iteration segments
(256 chains x 6 x 2^8 = 393k worst-case leapfrogs < 400k budget).

  nuts_256  — the artifact that crashed in round 4, now under the budget
  nuts_128  — rerun with 3x the warmup (round 4's R-hat 1.077 at
              warmup=200 indicates under-adaptation; target <= 1.02)

Usage: python scripts/chip_batch_r5c.py [--skip s ...] [--only s ...]
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


@step_def("ecog_m200_rollback")
def _ecog_m200_rollback():
    # the cold-start M=200 run carries ONE transient non-finite step
    # (absorbed by the grad mask + clip; step 1398 in
    # workload_ecog_m200_tpu_r5_cold.json).  divergence_rollback retries
    # the offending chunk at half lr, so the ACCEPTED trajectory should be
    # non-finite-free end to end (first_nonfinite_step: -1).
    run_script(
        "scripts/run_workload.py",
        ["ecog", "--M", "200", "--itnum", "50", "--auto-rollback",
         "--out", "results/workload_ecog_m200_tpu_r5_rollback.json"],
    )


@step_def("pm25_full_stable")
def _pm25_full_stable():
    # the clip+decay recipe that stabilized HCP is NOT enough for
    # pm25-full at lr=0.01 (loss escape at step ~3.7k, NaN from 7.2k,
    # results/workload_pm25_full_tpu_r5.json).  Two candidate recipes —
    # the auto-rollback feature (halves lr on the detected escape) and a
    # gentler lr with decay:
    run_script(
        "scripts/run_workload.py",
        ["pm25", "--full", "--itnum", "300", "--auto-rollback",
         "--out", "results/workload_pm25_full_tpu_r5_rollback.json"],
    )
    run_script(
        "scripts/run_workload.py",
        ["pm25", "--full", "--itnum", "300", "--lr", "0.005",
         "--lr-decay", "0.99",
         "--out", "results/workload_pm25_full_tpu_r5_lr005.json"],
    )


@step_def("mfu_push")
def _mfu_push():
    # M=128 (MXU-aligned) x large B x bf16-moment Adam: the measured-best
    # levers stacked (9.0% MFU at M=128/B=512 r4; 10.3% at M=100/B=2048
    # adam_bf16 r5) — the ceiling probe for VERDICT weak #4
    import json as _json
    import time as _time

    from _chip_batch_util import last_json_line as _ljl

    for M, B, opt, name in (
        ("128", "2048", "adam_bf16", "m128_b2048_adambf16"),
        ("128", "2048", "adam", "m128_b2048_adam"),
        ("128", "1024", "adam_bf16", "m128_b1024_adambf16"),
    ):
        rec = _ljl(run_script("scripts/bench_ecog.py",
                              ["--M", M, "--B", B, "--optimizer", opt]))
        rec["measured_at"] = _time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(f"results/bench_ecog_tpu_r5_{name}.json", "w") as f:
            _json.dump(rec, f)


@step_def("nuts_256")
def _nuts_256():
    run_script(
        "scripts/run_mcmc_sim.py",
        ["--N", "100", "--chains", "256", "--warmup", "200",
         "--samples", "200", "--sampler", "nuts",
         "--out", "results/nuts_256chain_tpu.json",
         "--plots-dir", "results/figs_256"],
    )


@step_def("nuts_128")
def _nuts_128():
    run_script(
        "scripts/run_mcmc_sim.py",
        ["--N", "100", "--chains", "128", "--warmup", "600",
         "--samples", "400", "--sampler", "nuts",
         "--out", "results/nuts_128chain_tpu_r5.json"],
    )


ORDER = ["ecog_m200_rollback", "pm25_full_stable", "mfu_push", "nuts_256", "nuts_128"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", nargs="*", default=[])
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    os.makedirs("results/figs_256", exist_ok=True)
    step, status = make_stepper("results/chip_batch_r5c_status.json")
    for name in ORDER:
        if args.only is not None and name not in args.only:
            continue
        if name in args.skip:
            continue
        step(name, STEPS[name])
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
