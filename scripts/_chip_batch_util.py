"""Shared helpers for the single-grant chip batch orchestrators.

Axon grant acquisition costs minutes per process, so each round's chip
measurements run sequentially inside ONE python process via runpy
(shared backend claim + compile cache).  The chip_batch_r4*.py scripts
import these helpers; new rounds should follow the same pattern
(docs/DESIGN.md §13, verify skill notes).
"""

from __future__ import annotations

import io
import json
import os
import runpy
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class Tee(io.TextIOBase):
    """Mirror writes to several streams (live log + captured buffer)."""

    def __init__(self, *streams):
        self.streams = streams

    def write(self, s):
        for st in self.streams:
            st.write(s)
        return len(s)

    def flush(self):
        for st in self.streams:
            st.flush()


def setup_batch_env():
    """Chdir to the repo, make it importable, and tell bench.py not to
    spawn probe children (this process holds/acquires the claim itself)."""
    sys.path.insert(0, REPO)
    os.chdir(REPO)
    os.environ["CNMGP_ASSUME_TPU"] = "1"


def run_script(script, argv):
    """Run a repo script in-process with patched argv; returns its stdout
    text (also echoed live)."""
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


def last_json_line(text):
    """Parse the final JSON object line a script printed."""
    line = [l for l in text.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def make_stepper(status_path):
    """Returns (step, status): step(name, fn) runs fn, records ok/wall_s,
    persists the status file after every step, and never lets one failure
    lose the rest of the batch.  An existing status file is merged in so
    a re-run with --only does not erase earlier steps' records."""
    status = {}
    if os.path.exists(status_path):
        try:
            with open(status_path) as f:
                status = json.load(f)
        except Exception:
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
        with open(status_path, "w") as f:
            json.dump(status, f, indent=2)

    return step, status
