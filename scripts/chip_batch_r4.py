"""Round-4 chip batch: every TPU measurement in ONE process / ONE grant.

The axon grant costs minutes per process acquisition, so all chip jobs run
sequentially inside this single process via runpy (shared backend claim,
shared compile cache).  Steps are ordered most-valuable-first and each is
wrapped so one failure doesn't lose the rest.  Jax global-config mutations
by steps (e.g. run_mcmc_sim's matmul precision) only affect later steps, so
MCMC runs last.

Usage: python scripts/chip_batch_r4.py [--skip step ...] [--only step ...]
"""

import argparse
import io
import json
import os
import runpy
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)
os.environ["CNMGP_ASSUME_TPU"] = "1"  # bench.py: no probe child (we hold the claim)


class Tee(io.TextIOBase):
    def __init__(self, *streams):
        self.streams = streams

    def write(self, s):
        for st in self.streams:
            st.write(s)
        return len(s)

    def flush(self):
        for st in self.streams:
            st.flush()


def run_script(script, argv, capture=None):
    """Run a repo script in-process with patched argv; returns captured
    stdout text (also echoed live)."""
    old_argv = sys.argv
    buf = io.StringIO()
    old_stdout = sys.stdout
    sys.stdout = Tee(old_stdout, buf)
    try:
        sys.argv = [script] + argv
        runpy.run_path(os.path.join(REPO, script), run_name="__main__")
    finally:
        sys.argv = old_argv
        sys.stdout = old_stdout
    return buf.getvalue()


STEPS = {}


def step(name):
    def deco(fn):
        STEPS[name] = fn
        return fn

    return deco


@step("bench")
def _bench():
    out = run_script("bench.py", [])
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open("results/bench_tpu_r4.json", "w") as f:
        json.dump(rec, f)


@step("ecog_ab")
def _ecog_ab():
    for flag, name in ((False, "f32"), (True, "bf16")):
        argv = ["--M", "100", "--B", "512"] + (["--bf16"] if flag else [])
        out = run_script("scripts/bench_ecog.py", argv)
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(f"results/bench_ecog_tpu_r4_{name}.json", "w") as f:
            json.dump(rec, f)


@step("sim_parity")
def _sim_parity():
    seeds = [str(s) for s in range(10)]
    for data, itnum in (
        ("sim_illustration_low_freq", "2000"),
        ("sim_illustration_high_freq", "2000"),
        ("sim_illustration_varying_freq", "2000"),
    ):
        short = data.replace("sim_illustration_", "")
        for mode in ("ref_compat", "true"):
            run_script(
                "scripts/sim_parity.py",
                ["--data", data, "--M", "20", "--itnum", itnum,
                 "--kl-mode", mode, "--seeds"] + seeds +
                ["--out", f"results/sim_{short}_10seed_2000ep_r4_{mode}.json"] +
                (["--plots-dir", "results/figs"] if short == "low_freq" else []),
            )


@step("ecog_per_m")
def _ecog_per_m():
    run_script(
        "scripts/ecog_per_m_study.py",
        ["--out", "results/ecog_per_m_rmse.json"],
    )


@step("hcp")
def _hcp():
    run_script(
        "scripts/run_workload.py",
        ["hcp", "--out", "results/workload_hcp_tpu_r4.json"],
    )


@step("smc")
def _smc():
    run_script(
        "scripts/run_model_comparison.py",
        ["--particles", "2048", "--out", "results/smc_model_comparison_tpu.json"],
    )


@step("nuts_multichain")
def _nuts_multichain():
    rows = []
    for chains in ("64", "256"):
        out = run_script(
            "scripts/run_mcmc_sim.py",
            ["--N", "100", "--chains", chains, "--warmup", "200",
             "--samples", "200", "--sampler", "nuts", "--segment-iters", "25",
             "--out", f"results/nuts_{chains}chain_tpu.json",
             "--plots-dir"] + (["results/figs"] if chains == "64" else ["results/figs_256"]),
        )
        with open(f"results/nuts_{chains}chain_tpu.json") as f:
            rows.append(json.load(f))
    with open("results/nuts_multichain_tpu.json", "w") as f:
        json.dump(rows, f, indent=2)


ORDER = ["bench", "ecog_ab", "sim_parity", "ecog_per_m", "hcp", "smc", "nuts_multichain"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", nargs="*", default=[])
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    os.makedirs("results/figs", exist_ok=True)
    status = {}
    for name in ORDER:
        if args.only is not None and name not in args.only:
            continue
        if name in args.skip:
            continue
        t0 = time.time()
        print(f"\n===== step {name} =====", flush=True)
        try:
            STEPS[name]()
            status[name] = {"ok": True, "wall_s": round(time.time() - t0, 1)}
        except Exception:
            traceback.print_exc()
            status[name] = {"ok": False, "wall_s": round(time.time() - t0, 1)}
        print(f"===== step {name} done: {status[name]} =====", flush=True)
        with open("results/chip_batch_r4_status.json", "w") as f:
            json.dump(status, f, indent=2)
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
