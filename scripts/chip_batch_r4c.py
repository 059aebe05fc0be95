"""Round-4 chip batch #3: optimizer A/B + HCP long-run divergence probe."""

import json
import time

from _chip_batch_util import last_json_line, make_stepper, run_script, setup_batch_env

setup_batch_env()


def main():
    step, status = make_stepper("results/chip_batch_r4c_status.json")

    def ecog_adafactor():
        rec = last_json_line(run_script(
            "scripts/bench_ecog.py",
            ["--M", "100", "--B", "512", "--optimizer", "adafactor"]))
        rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open("results/bench_ecog_tpu_r4_adafactor.json", "w") as f:
            json.dump(rec, f)

    step("ecog_adafactor", ecog_adafactor)
    step("hcp100", lambda: run_script(
        "scripts/run_workload.py",
        ["hcp", "--itnum", "100",
         "--out", "results/workload_hcp_tpu_r4_100ep.json"]))
    step("hcp200_diag", lambda: run_script(
        "scripts/run_workload.py",
        ["hcp", "--itnum", "200",
         "--out", "results/workload_hcp_tpu_r4_200ep.json"]))
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
