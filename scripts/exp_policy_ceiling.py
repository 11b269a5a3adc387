#!/usr/bin/env python
"""Policy-ceiling probe for 256² AdvancedBulldozer learning analysis.

Question (VERDICT r2 #4): is the flat PPO return at 256² a budget problem or
is the reward essentially uncontrollable at that scale?  Bound the answer by
measuring full-episode returns for policies spanning the control range:

* idle        — never move, never shoot (pure fire dynamics)
* random      — uniform actions (PPO's starting point)
* greedy-fire — move toward the fire centroid, shoot every step (a strong
                hand policy; no learned policy at 1e7 steps will beat it by
                much at this scale)

If greedy-fire barely separates from idle/random, the per-episode reward is
dominated by uncontrollable fire growth and the PPO null result is about the
ENVIRONMENT's signal at 256², not the optimizer.

Usage: python scripts/exp_policy_ceiling.py [--size 256] [--envs 8]
       [--steps 6000] [--speed-multiplier 1.0]
"""
from __future__ import annotations

# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys

import jax
import jax.numpy as jnp


def run_policy(env, name: str, steps: int, num_envs: int, sm: float):
    obs, info = env.reset()

    def fire_seek_action(ctx, position):
        tg = ctx["per_env_context"]["true_grid"]  # (N, H, W), 2 == fire
        fire = (tg == 2).astype(jnp.float32)
        h, w = fire.shape[1], fire.shape[2]
        tot = jnp.maximum(fire.sum((1, 2)), 1.0)
        rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        cr = (fire * rows).sum((1, 2)) / tot
        cc = (fire * cols).sum((1, 2)) / tot
        dr = jnp.sign(cr - position[:, 0].astype(jnp.float32)).astype(jnp.int32)
        dc = jnp.sign(cc - position[:, 1].astype(jnp.float32)).astype(jnp.int32)
        move = (dr + 1) * 3 + (dc + 1)
        shoot = jnp.ones((move.shape[0],), jnp.int32)
        ext = jnp.zeros_like(move)
        return jnp.stack([move, shoot, ext], axis=1)

    @jax.jit
    def run(obs, info, key):
        def body(carry, k):
            obs, info, ret, done = carry
            ctx = obs[1]
            n = ctx["position"].shape[0]
            if name == "idle":
                acts = jnp.tile(jnp.asarray([4, 0, 0], jnp.int32), (n, 1))
            elif name == "random":
                acts = jnp.stack(
                    [jax.random.randint(k, (n,), 0, 9),
                     jax.random.randint(jax.random.fold_in(k, 1), (n,), 0, 2),
                     jnp.zeros((n,), jnp.int32)], axis=1)
            else:
                acts = fire_seek_action(ctx, ctx["position"])
            obs2, reward, term, trunc, info2 = env.stateless_step(
                acts, obs, info
            )
            ret = ret + jnp.where(done, 0.0, reward)
            done = done | term | trunc
            return (obs2, info2, ret, done), None

        ret0 = jnp.zeros((num_envs,), jnp.float32)
        done0 = jnp.zeros((num_envs,), bool)
        (obs, info, ret, done), _ = jax.lax.scan(
            body, (obs, info, ret0, done0), jax.random.split(key, steps)
        )
        return ret, done

    ret, done = run(obs, info, jax.random.key(17))
    ret = jax.device_get(ret)
    done = jax.device_get(done)
    return {
        "policy": name,
        "mean_return": float(ret.mean()),
        "min": float(ret.min()),
        "max": float(ret.max()),
        "done_frac": float(done.mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--speed-multiplier", type=float, default=1.0)
    ap.add_argument("--ca-repeat-mode", type=str, default="single",
                    choices=("single", "modf"))
    a = ap.parse_args()

    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv

    results = []
    for name in ("idle", "random", "greedy-fire"):
        env = AdvancedForestFireBulldozerEnv(
            a.size, a.size, key=jax.random.key(0), num_envs=a.envs,
            speed_multiplier=a.speed_multiplier,
            ca_repeat_mode=a.ca_repeat_mode,
            use_pallas_ca=(a.size >= 128 and a.ca_repeat_mode == "single"),
        )
        r = run_policy(env, name, a.steps, a.envs, a.speed_multiplier)
        print(json.dumps(r), flush=True)
        results.append(r)
    spread = results[-1]["mean_return"] - results[0]["mean_return"]
    print(f"# greedy-fire vs idle separation: {spread:+.1f} "
          f"(sm={a.speed_multiplier}, ca={a.ca_repeat_mode})", file=sys.stderr)


if __name__ == "__main__":
    main()
