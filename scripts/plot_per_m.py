"""Figure: ECoG per-M held-out RMSE — round-4 anomaly vs round-5 fix.

Reads the committed study artifacts and writes
results/figs/ecog_per_m_rmse.png:
  - round 4 (no clip): the M=50 dip (RMSE 0.85) from the late-training
    loss escape, docs/DESIGN.md §16
  - round 5 (driver-default grad clip, 2 seeds): flat ~0.29-0.30 across
    M in {25, 50, 100, 128, 200}

Run: python scripts/plot_per_m.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    with open("results/ecog_per_m_rmse.json") as f:
        r4 = json.load(f)
    with open("results/ecog_per_m_rmse_r5_ls5_clip.json") as f:
        r5 = json.load(f)

    fig = plt.figure(figsize=(6.4, 4.2))
    m4 = [r["M"] for r in r4]
    plt.plot(m4, [r["rmse_test"] for r in r4], "o--", color="#b44",
             label="round 4 (unclipped, 1 seed)")
    for seed in sorted({r["seed"] for r in r5}):
        rows = [r for r in r5 if r["seed"] == seed]
        plt.plot([r["M"] for r in rows], [r["rmse_test"] for r in rows],
                 "o-", label=f"round 5 (grad clip, seed {seed})")
    plt.xlabel("inducing points M", fontsize=13)
    plt.ylabel("held-out RMSE", fontsize=13)
    plt.title("ECoG held-out-channel prediction vs M", fontsize=13)
    plt.legend(fontsize=10)
    plt.grid(alpha=0.3)
    plt.tight_layout()
    os.makedirs("results/figs", exist_ok=True)
    out = "results/figs/ecog_per_m_rmse.png"
    plt.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    main()
