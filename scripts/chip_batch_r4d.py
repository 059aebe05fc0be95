"""Round-4 chip batch #4: HCP long-run stability A/B with the new guards.

The 200-epoch HCP run diverges (loss min at step ~2159, first nonfinite
loss at step 8636, then 3e12).  Round 4 added (a) a ±30 clamp on the
log-lengthscale draws before exp (f32 overflow guard, semantics-free in
the fitted region) and (b) an optional global-norm gradient clip.  This
batch re-runs the diverging configuration with clamp-only and with
clamp+clip to locate which guard restores stability.
"""

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
os.environ["CNMGP_ASSUME_TPU"] = "1"


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


def run_script(script, argv):
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


def main():
    status = {}

    def step(name, fn):
        t0 = time.time()
        print(f"\n===== step {name} =====", flush=True)
        try:
            fn()
            status[name] = {"ok": True, "wall_s": round(time.time() - t0, 1)}
        except Exception:
            traceback.print_exc()
            status[name] = {"ok": False, "wall_s": round(time.time() - t0, 1)}
        print(f"===== step {name} done: {status[name]} =====", flush=True)
        with open("results/chip_batch_r4d_status.json", "w") as f:
            json.dump(status, f, indent=2)

    def hcp200_clamp():
        run_script("scripts/run_workload.py",
                   ["hcp", "--itnum", "200",
                    "--out", "results/workload_hcp_tpu_r4_200ep_clamp.json"])

    def hcp200_clip():
        run_script("scripts/run_workload.py",
                   ["hcp", "--itnum", "200", "--grad-clip", "1000",
                    "--out", "results/workload_hcp_tpu_r4_200ep_clip.json"])

    step("hcp200_clamp", hcp200_clamp)
    step("hcp200_clip", hcp200_clip)
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
