"""Round-4 chip batch #3: optimizer A/B + HCP long-run divergence probe."""

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
        with open("results/chip_batch_r4c_status.json", "w") as f:
            json.dump(status, f, indent=2)

    def ecog_adafactor():
        out = run_script("scripts/bench_ecog.py",
                         ["--M", "100", "--B", "512", "--optimizer", "adafactor"])
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open("results/bench_ecog_tpu_r4_adafactor.json", "w") as f:
            json.dump(rec, f)

    def hcp100():
        run_script("scripts/run_workload.py",
                   ["hcp", "--itnum", "100",
                    "--out", "results/workload_hcp_tpu_r4_100ep.json"])

    def hcp200_diag():
        run_script("scripts/run_workload.py",
                   ["hcp", "--itnum", "200",
                    "--out", "results/workload_hcp_tpu_r4_200ep.json"])

    step("ecog_adafactor", ecog_adafactor)
    step("hcp100", hcp100)
    step("hcp200_diag", hcp200_diag)
    print(json.dumps(status, indent=2))


if __name__ == "__main__":
    main()
