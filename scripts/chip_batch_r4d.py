"""Round-4 chip batch #4: HCP long-run stability A/B with the new guards.

The 200-epoch HCP run diverges (loss min at step ~2159, first nonfinite
loss at step 8636, then 3e12).  Round 4 added (a) a ±30 clamp on the
log-lengthscale draws before exp and (b) an optional global-norm gradient
clip; this batch re-runs the diverging configuration under each guard to
locate which restores stability (answer: the clip — docs/DESIGN.md §15).
"""

import json

from _chip_batch_util import make_stepper, run_script, setup_batch_env

setup_batch_env()


def main():
    step, status = make_stepper("results/chip_batch_r4d_status.json")
    step("hcp200_clamp", lambda: run_script(
        "scripts/run_workload.py",
        ["hcp", "--itnum", "200", "--grad-clip", "0",
         "--out", "results/workload_hcp_tpu_r4_200ep_clamp.json"]))
    step("hcp200_clip", lambda: run_script(
        "scripts/run_workload.py",
        ["hcp", "--itnum", "200", "--grad-clip", "1000",
         "--out", "results/workload_hcp_tpu_r4_200ep_clip.json"]))
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
