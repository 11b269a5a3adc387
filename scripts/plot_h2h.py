#!/usr/bin/env python
"""Overlay the reference trainer's learning curve against gymca_tpu's at
identical config (VERDICT r3 #2: 'an overlaid curve is evidence').

Inputs: docs/assets/ref_curve_adv64.json  (scripts/run_reference_ppo.py)
        docs/assets/ppo_curve_adv64_h2h.json  (scripts/train_curve.py)
Output: docs/assets/h2h_adv64.{svg,json}
"""
from __future__ import annotations

# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

ASSETS = Path("docs/assets")


def smooth(y, k):
    if len(y) < k + 1:
        return y
    return np.convolve(y, np.ones(k) / k, mode="valid")


def load_ours(path):
    ours = json.loads(path.read_text())
    o_steps = np.asarray([m["global_step"] for m in ours["history"]])
    o_vals = np.asarray(
        [m.get("episodic_return", np.nan) for m in ours["history"]]
    )
    ov = (o_vals != 0.0) & ~np.isnan(o_vals)
    return ours, o_steps, o_vals, ov


def main():
    ref = json.loads((ASSETS / "ref_curve_adv64.json").read_text())
    ours, o_steps, o_vals, ov = load_ours(ASSETS / "ppo_curve_adv64_h2h.json")
    # optional seed replicates (ppo_curve_adv64_h2h_s<k>.json) -> seed band
    seed_runs = sorted(ASSETS.glob("ppo_curve_adv64_h2h_s*.json"))
    seed_curves = [load_ours(p) for p in seed_runs]

    # reference: TB scalar charts/avg_episodic_return is (step, value) pairs
    r = np.asarray(ref["scalars"]["charts/avg_episodic_return"], np.float64)
    r_steps, r_vals = r[:, 0], r[:, 1]
    rv = r_vals != 0.0

    fig, ax = plt.subplots(figsize=(8, 4.5))
    k = 25
    ax.plot(r_steps[rv], r_vals[rv], lw=0.6, alpha=0.25, color="tab:red")
    ax.plot(r_steps[rv][k - 1:], smooth(r_vals[rv], k), lw=2,
            color="tab:red",
            label=f"reference jax_ppo ({ref['sps']:.0f} SPS)")
    ax.plot(o_steps[ov], o_vals[ov], lw=0.6, alpha=0.25, color="tab:blue")
    o_sps = o_steps[-1] / ours["wall_seconds"]
    ax.plot(o_steps[ov][k - 1:], smooth(o_vals[ov], k), lw=2,
            color="tab:blue", label=f"gymca_tpu ({o_sps:.0f} SPS)")
    for i, (_, s_steps, s_vals, sv) in enumerate(seed_curves):
        ax.plot(s_steps[sv][k - 1:], smooth(s_vals[sv], k), lw=1.2,
                color="tab:blue", alpha=0.5,
                label="gymca_tpu (other seeds)" if i == 0 else None)
    ax.set_xlabel("env steps")
    ax.set_ylabel("mean episodic return")
    ax.set_title(
        "AdvancedBulldozer 64x64, 8 envs, seed 7, default PPO - "
        "reference vs gymca_tpu, one TPU v5e chip"
    )
    ax.grid(alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(ASSETS / "h2h_adv64.svg")

    def tail_mean(steps, vals, frac=0.2):
        n = max(int(len(vals) * frac), 1)
        return float(np.mean(vals[-n:]))

    summary = {
        "config": "AdvancedBulldozer 64x64, 8 envs, 2M steps, seed 7, "
                  "default PPO, f32",
        "reference": {
            "sps": ref["sps"],
            "wall_s": ref["elapsed_s"],
            "early_return": float(np.mean(r_vals[rv][: max(len(r_vals[rv]) // 8, 3)])),
            "late_return": tail_mean(r_steps[rv], r_vals[rv]),
        },
        "gymca_tpu": {
            "sps": float(o_sps),
            "wall_s": ours["wall_seconds"],
            "early_return": float(np.mean(o_vals[ov][: max(len(o_vals[ov]) // 8, 3)])),
            "late_return": tail_mean(o_steps[ov], o_vals[ov]),
        },
    }
    # episodic return conflates policy quality with episode LENGTH (longer
    # survival = more negative sum); record the per-step reward too
    rps = np.asarray(
        [v for _, v in ref["scalars"]["charts/avg_return_per_timestep"]
         if v != 0.0]
    )
    summary["reference"]["late_reward_per_step"] = tail_mean(None, rps)
    ops = np.asarray(
        [m.get("mean_reward", np.nan) for m in ours["history"]]
    )
    opsv = ops[~np.isnan(ops) & (ops != 0.0)]
    summary["gymca_tpu"]["late_reward_per_step"] = tail_mean(None, opsv)
    summary["sps_ratio"] = summary["gymca_tpu"]["sps"] / summary["reference"]["sps"]
    if seed_curves:
        summary["gymca_tpu"]["late_return_by_seed"] = [
            tail_mean(s[m], v[m], 0.2)
            for (_, s, v, m) in seed_curves
        ] + [summary["gymca_tpu"]["late_return"]]
    (ASSETS / "h2h_adv64.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
