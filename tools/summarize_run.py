"""Summarize a training run's scalars.jsonl into a loss-curve table + PNGs.

Usage: python tools/summarize_run.py /tmp/runs/s2_long [key ...]

Prints a markdown table of selected scalar keys at ~6 evenly spaced steps
(first, 20%, 40%, 60%, 80%, final) and writes <run>/curves.png with one
subplot per key. Used to record sustained-training evidence in BASELINE.md.
"""
import json
import os
import sys

import numpy as np


def load(run_dir):
    rows = []
    with open(os.path.join(run_dir, "scalars.jsonl")) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    run_dir = sys.argv[1]
    rows = load(run_dir)
    keys = sys.argv[2:]
    if not keys:
        keys = sorted(k for k in rows[-1] if k not in ("step", "time")
                      and not k.startswith("steps_per"))
    steps = np.array([r["step"] for r in rows])
    picks = sorted(set(int(round(q * (len(rows) - 1))) for q in
                       (0, 0.2, 0.4, 0.6, 0.8, 1.0)))

    hdr = "| step | " + " | ".join(keys) + " |"
    print(hdr)
    print("|" + "---|" * (len(keys) + 1))
    for i in picks:
        r = rows[i]
        cells = [f"{r.get(k, float('nan')):.4g}" for k in keys]
        print(f"| {r['step']} | " + " | ".join(cells) + " |")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = len(keys)
        ncol = min(3, n)
        nrow = (n + ncol - 1) // ncol
        fig, axes = plt.subplots(nrow, ncol, figsize=(4 * ncol, 2.5 * nrow),
                                 squeeze=False)
        for j, k in enumerate(keys):
            ax = axes[j // ncol][j % ncol]
            vals = [r.get(k, np.nan) for r in rows]
            ax.plot(steps, vals, lw=1)
            ax.set_title(k, fontsize=8)
            ax.tick_params(labelsize=7)
        fig.tight_layout()
        out = os.path.join(run_dir, "curves.png")
        fig.savefig(out, dpi=110)
        print(f"\nwrote {out}")
    except Exception as e:  # matplotlib optional
        print(f"\n(no plot: {e})")


if __name__ == "__main__":
    main()
