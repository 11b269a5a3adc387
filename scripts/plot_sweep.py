#!/usr/bin/env python
"""Overlay PPO learning curves from docs/assets/ppo_curve_*.json.

Usage: python scripts/plot_sweep.py --tags adv256_lr1e3 adv256_ent05 ... \
           --out docs/assets/ppo_sweep_adv256_r3.svg --title "..."
"""
from __future__ import annotations

# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tags", nargs="+", required=True)
    ap.add_argument("--assets", type=str, default="docs/assets")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--title", type=str, default="")
    ap.add_argument("--labels", nargs="*", default=None)
    a = ap.parse_args()

    fig, ax = plt.subplots(figsize=(8, 4.5))
    for j, tag in enumerate(a.tags):
        blob = json.loads(
            (Path(a.assets) / f"ppo_curve_{tag}.json").read_text()
        )
        hist = blob["history"]
        steps = np.asarray([m["global_step"] for m in hist])
        rets = np.asarray([m.get("episodic_return", np.nan) for m in hist])
        valid = (rets != 0.0) & ~np.isnan(rets)
        label = (a.labels[j] if a.labels and j < len(a.labels)
                 else blob["config"])
        color = f"C{j}"
        ax.plot(steps[valid], rets[valid], lw=0.6, alpha=0.25, color=color)
        if valid.sum() > 20:
            k = max(valid.sum() // 40, 1)
            sm = np.convolve(rets[valid], np.ones(k) / k, mode="valid")
            ax.plot(steps[valid][k - 1:], sm, lw=2, color=color, label=label)
        else:
            ax.plot([], [], lw=2, color=color, label=label)
    ax.set_xlabel("env steps")
    ax.set_ylabel("mean episodic return")
    if a.title:
        ax.set_title(a.title)
    ax.grid(alpha=0.3)
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(a.out)
    print("wrote", a.out)


if __name__ == "__main__":
    main()
