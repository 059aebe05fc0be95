"""Round-5 chip batch E: measure the bf16-moment checkpoint save.

  ckpt_bf16 — the DESIGN §17.3 fix, measured: the M=200 ECoG train state
              (~1 GB, Adam moments two-thirds of it) saved with
              `--ckpt-bf16-moments` vs the round-5 f32 probe's 106-140 s
              `ckpt_save_s`.  Expect ~2x less tunnel traffic on the
              moments, i.e. a save in the ~60-80 s range.
  dsvi_scaling_chip — the DP-DSVI scaling harness's 1-device point on
              the real chip (devices>1 need a pod slice; the artifact
              complements results/scaling_dsvi_virtual_cpu.json).

Usage: python scripts/chip_batch_r5e.py [--skip s ...] [--only s ...]
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


@step_def("ckpt_bf16")
def _ckpt_bf16():
    run_script(
        "scripts/run_workload.py",
        ["ecog", "--M", "200", "--itnum", "2",
         "--checkpoint", "results/ckpt_ecog_m200_r5_bf16.pkl",
         "--ckpt-bf16-moments",
         "--out", "results/workload_ecog_m200_tpu_r5_ckpt_bf16.json"],
    )


@step_def("dsvi_scaling_chip")
def _dsvi_scaling_chip():
    run_script(
        "scripts/bench_scaling_dsvi.py",
        ["--devices", "1", "--steps", "100",
         "--out", "results/scaling_dsvi_1chip_tpu.json"],
    )


ORDER = ["ckpt_bf16", "dsvi_scaling_chip"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", nargs="*", default=[])
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    step, status = make_stepper("results/chip_batch_r5e_status.json")
    for name in ORDER:
        if args.only is not None and name not in args.only:
            continue
        if name in args.skip:
            continue
        step(name, STEPS[name])
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
