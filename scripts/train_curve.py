#!/usr/bin/env python
"""Run a PPO training curve and dump docs/assets artifacts (JSON + SVG).

Usage: python scripts/train_curve.py --size 256 --num-envs 32 --iters 800 \
           --bf16 --seed 7 --tag adv256
Produces docs/assets/ppo_curve_<tag>.{json,svg} in the BASELINE.md format.
"""
from __future__ import annotations

# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--num-envs", type=int, default=32)
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--tag", type=str, required=True)
    ap.add_argument("--out", type=str, default="docs/assets")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--ent-coef", type=float, default=None)
    ap.add_argument("--speed-multiplier", type=float, default=1.0,
                    help="curriculum knob: >1 makes fires spread slower "
                         "relative to the agent")
    ap.add_argument("--pallas-ca", action="store_true",
                    help="train through the fused Pallas Alexandridis CA")
    ap.add_argument("--ca-repeat-mode", type=str, default="single",
                    choices=("single", "modf"),
                    help="'single' = reference JAX semantics (CA fires "
                         "every step; speed knobs are bookkeeping only); "
                         "'modf' = classic time-gated CA, where "
                         "speed_multiplier really changes the agent/fire "
                         "speed ratio")
    ap.add_argument("--gamma", type=float, default=None,
                    help="discount (default 0.99; ~0.999 for long modf "
                         "horizons)")
    ap.add_argument("--gae-lambda", type=float, default=None)
    ap.add_argument("--shape-tree-coef", type=float, default=0.0,
                    help="potential-based shaping: phi += c * trees_frac")
    ap.add_argument("--shape-dist-coef", type=float, default=0.0,
                    help="potential-based shaping: phi -= c * "
                         "dist(agent, fire centroid)/diag")
    ap.add_argument("--shape-douse-coef", type=float, default=0.0,
                    help="potential-based shaping: phi += c * "
                         "|doused cells with fire in their 5x5 box|/100")
    ap.add_argument("--position-features", action="store_true",
                    help="feed normalized agent position to actor/critic")
    ap.add_argument("--centroid-features", action="store_true",
                    help="also feed the agent->fire-centroid offset (a STATE "
                         "feature; isolates perception vs control failures)")
    ap.add_argument("--sm-schedule", type=str, default=None,
                    help="speed-multiplier curriculum, e.g. '6:0.4,3:0.3,1:0.3'"
                         " = sm 6 for 40%% of iters, then 3, then 1; params "
                         "carry across stages (overrides --speed-multiplier)")
    ap.add_argument("--bc-iters", type=int, default=0,
                    help="behavior-cloning warm-start iterations from the "
                         "greedy-fire demonstrator before PPO (kickstart "
                         "for long modf horizons)")
    ap.add_argument("--critic-warmup-iters", type=int, default=0,
                    help="PPO iterations with torso+actor frozen after BC "
                         "(critic learns the cloned policy's values first)")
    ap.add_argument("--kickstart-coef", type=float, default=0.0,
                    help="auxiliary CE toward the greedy demonstrator on the "
                         "move/shoot heads, annealed to 0")
    ap.add_argument("--kickstart-decay", type=int, default=0,
                    help="iterations over which the kickstart CE anneals "
                         "(0 = across the whole run)")
    ap.add_argument("--save-params", type=str, default=None,
                    help="pickle the final params (+ run config) here for "
                         "scripts/eval_policy.py")
    a = ap.parse_args()

    import jax

    from gymca_tpu.agents.args import Args, EnvArgs, ExperimentArgs, PPOArgs, \
        VisualizationArgs
    from gymca_tpu.agents.ppo import PPOTrainer
    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv

    ppo_kwargs = {}
    if a.lr is not None:
        ppo_kwargs["learning_rate"] = a.lr
    if a.ent_coef is not None:
        ppo_kwargs["ent_coef"] = a.ent_coef
    if a.gamma is not None:
        ppo_kwargs["gamma"] = a.gamma
    if a.gae_lambda is not None:
        ppo_kwargs["gae_lambda"] = a.gae_lambda
    ppo_kwargs["shape_tree_coef"] = a.shape_tree_coef
    ppo_kwargs["shape_dist_coef"] = a.shape_dist_coef
    ppo_kwargs["shape_douse_coef"] = a.shape_douse_coef
    ppo_kwargs["kickstart_coef"] = a.kickstart_coef
    ppo_kwargs["kickstart_decay_iters"] = a.kickstart_decay

    # curriculum stages: [(speed_multiplier, num_iters)]
    if a.sm_schedule:
        stages = []
        for part in a.sm_schedule.split(","):
            sm_s, frac_s = part.split(":")
            stages.append((float(sm_s), float(frac_s)))
        total_frac = sum(f for _, f in stages)
        stages = [(sm, max(int(round(a.iters * f / total_frac)), 1))
                  for sm, f in stages]
    else:
        stages = [(a.speed_multiplier, a.iters)]

    def make_args(sm, iters, stage_i):
        # BC / critic-warmup / kickstart-CE are START-of-training phases:
        # only stage 0 runs them.  Later curriculum stages would otherwise
        # re-freeze the torso/actor and snap the annealed CE back to full
        # strength, yanking a policy that has moved past the clone.
        stage_kwargs = dict(ppo_kwargs)
        if stage_i > 0:
            stage_kwargs["kickstart_coef"] = 0.0
        return Args(
            ppo=PPOArgs(**stage_kwargs),
            env=EnvArgs(num_envs=a.num_envs, size=a.size,
                        speed_multiplier=sm),
            viz=VisualizationArgs(),
            exp=ExperimentArgs(
                total_timesteps=iters * a.num_envs * 128,
                num_ppo_steps=128, seed=a.seed, bf16_compute=a.bf16,
                position_features=a.position_features,
                centroid_features=a.centroid_features,
                critic_warmup_iters=(
                    a.critic_warmup_iters if stage_i == 0 else 0
                ),
            ),
        )

    history = []
    carry_state, carry_key = None, None
    t0 = time.time()
    for stage_i, (sm, stage_iters) in enumerate(stages):
        env = AdvancedForestFireBulldozerEnv(
            a.size, a.size, key=jax.random.key(a.seed), num_envs=a.num_envs,
            speed_multiplier=sm, use_pallas_ca=a.pallas_ca,
            ca_repeat_mode=a.ca_repeat_mode,
        )
        trainer = PPOTrainer(env, make_args(sm, stage_iters, stage_i),
                             key=jax.random.key(a.seed))
        if carry_state is not None:
            # PARAMS carry across stages; the optimizer state does NOT — a
            # carried adam step count would push the per-stage linear LR
            # anneal negative (frac = 1 - count/stage_iters < 0) and blow
            # up training.  Fresh moments per stage is standard curriculum
            # practice anyway.
            trainer.agent_state = trainer.agent_state.replace(
                params=carry_state.params
            )
            trainer.key = carry_key
        if len(stages) > 1:
            print(f"[stage {stage_i + 1}/{len(stages)}] sm={sm} "
                  f"iters={stage_iters}", flush=True)
        if stage_i == 0 and a.bc_iters:
            def bc_log(it, m):
                if it % 10 == 0 or it == 1:
                    print(f"[bc] iter {it}/{a.bc_iters}: "
                          f"loss={m['bc_loss']:.4f} "
                          f"match={m['bc_match']:.3f}", flush=True)
            trainer.bc_pretrain(a.bc_iters, log_fn=bc_log)

        def log_fn(iteration, metrics, _sm=sm):
            metrics = dict(metrics)
            metrics["speed_multiplier"] = _sm
            history.append(metrics)
            if iteration % 20 == 0 or iteration == 1:
                print(
                    f"iter {len(history)}/{a.iters}: SPS={metrics['SPS']} "
                    f"return={metrics.get('episodic_return', float('nan')):.2f} "
                    f"loss={metrics.get('loss', float('nan')):.4f}",
                    flush=True,
                )

        trainer.train(num_iterations=stage_iters, log_fn=log_fn)
        carry_state, carry_key = trainer.agent_state, trainer.key
    wall = time.time() - t0

    if a.save_params:
        import pickle

        import jax as _jax

        Path(a.save_params).parent.mkdir(parents=True, exist_ok=True)
        with open(a.save_params, "wb") as f:
            pickle.dump(
                {
                    "params": _jax.device_get(carry_state.params),
                    "size": a.size,
                    "num_envs": a.num_envs,
                    "seed": a.seed,
                    "ca_repeat_mode": a.ca_repeat_mode,
                    "position_features": a.position_features,
                    "centroid_features": a.centroid_features,
                    "bf16": a.bf16,
                },
                f,
            )
        print(f"saved params -> {a.save_params}")

    out_dir = Path(a.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    overrides = []
    if a.lr is not None:
        overrides.append(f"lr={a.lr:g}")
    if a.ent_coef is not None:
        overrides.append(f"ent={a.ent_coef:g}")
    if a.speed_multiplier != 1.0:
        overrides.append(f"speed_mult={a.speed_multiplier:g}")
    if a.ca_repeat_mode != "single":
        overrides.append(f"ca={a.ca_repeat_mode}")
    if a.pallas_ca:
        overrides.append("pallas-ca")
    blob = {
        "config": (
            f"AdvancedBulldozer {a.size}x{a.size}, {a.num_envs} envs, "
            f"{'bf16' if a.bf16 else 'f32'}, seed {a.seed}, "
            + (" ".join(overrides) + " PPO" if overrides else "default PPO")
        ),
        # full CLI namespace so the artifact is self-describing (the r5
        # douse-run configs were otherwise unrecoverable after the session)
        "args": {k: v for k, v in vars(a).items() if k != "out"},
        "hardware": "TPU v5e (1 chip)",
        "wall_seconds": round(wall, 1),
        "history": [
            {k: round(float(v), 4) for k, v in m.items()} for m in history
        ],
    }
    jpath = out_dir / f"ppo_curve_{a.tag}.json"
    jpath.write_text(json.dumps(blob))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    steps = np.asarray([m["global_step"] for m in history])
    rets = np.asarray([m.get("episodic_return", np.nan) for m in history])
    valid = (rets != 0.0) & ~np.isnan(rets)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(steps[valid], rets[valid], lw=0.8, alpha=0.4, color="tab:blue")
    if valid.sum() > 20:
        k = max(valid.sum() // 40, 1)
        sm = np.convolve(rets[valid], np.ones(k) / k, mode="valid")
        ax.plot(steps[valid][k - 1:], sm, lw=2, color="tab:blue",
                label=f"episodic return (smoothed x{k})")
        ax.legend()
    ax.set_xlabel("env steps")
    ax.set_ylabel("mean episodic return")
    ax.set_title(blob["config"])
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_dir / f"ppo_curve_{a.tag}.svg")
    print(f"wrote {jpath} and .svg  (wall {wall:.0f}s)")

    early = rets[valid][: max(valid.sum() // 8, 5)].mean()
    late = rets[valid][-max(valid.sum() // 8, 5):].mean()
    print(f"return early {early:.1f} -> late {late:.1f}")


if __name__ == "__main__":
    main()
