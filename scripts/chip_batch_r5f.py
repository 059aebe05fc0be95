"""Round-5 chip batch F: 256-chain NUTS with doubled warmup.

The round-5 256-chain artifact (results/nuts_256chain_tpu.json, warmup
200) lands at max R-hat 1.068 — above the 1.05 bar, and the 128-chain
warmup A/B (200 -> 600 iters: max 1.077 -> 1.031,
results/nuts_128chain_tpu_r5.json) shows warmup length is the lever.
This reruns 256 chains at warmup 400 (sized to ~65 min on chip so the
round's driver bench window stays clear).
"""

import argparse
import json

from _chip_batch_util import make_stepper, run_script, setup_batch_env

setup_batch_env()

STEPS = {}


def step_def(name):
    def deco(fn):
        STEPS[name] = fn
        return fn

    return deco


@step_def("nuts_256_w400")
def _nuts_256_w400():
    run_script(
        "scripts/run_mcmc_sim.py",
        ["--N", "100", "--chains", "256", "--warmup", "400",
         "--samples", "200", "--sampler", "nuts",
         "--out", "results/nuts_256chain_tpu_w400.json"],
    )


ORDER = ["nuts_256_w400"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", nargs="*", default=[])
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    step, status = make_stepper("results/chip_batch_r5f_status.json")
    for name in ORDER:
        if args.only is not None and name not in args.only:
            continue
        if name in args.skip:
            continue
        step(name, STEPS[name])
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
