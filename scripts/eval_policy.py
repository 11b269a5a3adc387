#!/usr/bin/env python
"""Greedy evaluation of a trained PPO policy vs the hand-policy probes.

The training-curve metrics are composition-confounded under modf semantics
(episodes that finish early are biased toward lucky quick die-outs, and
per-step mean reward mixes post-reset fresh grids), so the honest learning
measure is: run the TRAINED policy greedily on fresh resets for full
episodes and compare mean return / extinguish rate against the idle /
random / greedy-fire probes from `exp_policy_ceiling.py` under identical
seeds.

Usage:
  python scripts/eval_policy.py --params outputs/p.pkl --steps 20000 \
      [--envs 16] [--probes]
"""
from __future__ import annotations

# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def greedy_policy_fn(blob, env):
    from gymca_tpu.agents.networks import Actor, Critic, Network

    network = Network(
        compute_dtype=jnp.bfloat16 if blob["bf16"] else jnp.float32
    )
    actor = Actor(
        action_dims=(9, 2), choose_k=tuple(env.extension_choices)
    )
    params = blob["params"]
    pos_feat = blob.get("position_features", False)
    cen_feat = blob.get("centroid_features", False)
    scale = jnp.asarray([env.nrows, env.ncols], jnp.float32)

    def features(context):
        pos = context["position"].astype(jnp.float32)
        feats = []
        if pos_feat:
            feats.append(pos / scale)
        if cen_feat:
            tg = context["per_env_context"]["true_grid"]
            fire = (tg == 2).astype(jnp.float32)
            h, w = tg.shape[-2], tg.shape[-1]
            tot = fire.sum((-2, -1))
            denom = jnp.maximum(tot, 1.0)
            rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
            cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
            cr = (fire * rows).sum((-2, -1)) / denom
            cc = (fire * cols).sum((-2, -1)) / denom
            has = (tot > 0).astype(jnp.float32)
            feats.append(jnp.stack(
                [has * (cr - pos[:, 0]) / h, has * (cc - pos[:, 1]) / w, has],
                axis=-1))
        return jnp.concatenate(feats, axis=-1) if feats else None

    def act(obs):
        hidden = network.apply(params["network_params"], obs[0])
        f = features(obs[1])
        if f is not None:
            hidden = jnp.concatenate([hidden, f], axis=-1)
        logits_set = actor.apply(params["actor_params"], hidden)
        return jnp.stack(
            [jnp.argmax(l, axis=-1) for l in logits_set], axis=1
        ).astype(jnp.int32)

    return act


def run_episodes(env, act_fn, steps: int, num_envs: int, key):
    """Mean return of the FIRST episode per env (no auto-reset; envs freeze
    after done like the ceiling probes)."""
    obs, info = env.reset()

    @jax.jit
    def run(obs, info, key):
        def body(carry, k):
            obs, info, ret, done = carry
            acts = act_fn(obs, k)
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

    ret, done = jax.device_get(run(obs, info, jax.random.key(17)))
    return {
        "mean_return": float(ret.mean()),
        "std_return": float(ret.std()),
        "min": float(ret.min()),
        "max": float(ret.max()),
        "done_frac": float(done.mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", type=str, required=True)
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--speed-multiplier", type=float, default=1.0)
    ap.add_argument("--env-key", type=int, default=0,
                    help="terrain/initial-state PRNG key; a non-default "
                         "value gives a held-out grid population (training "
                         "envs derive from key 0)")
    ap.add_argument("--probes", action="store_true",
                    help="also run idle/random/greedy-fire under the same "
                         "protocol")
    a = ap.parse_args()

    with open(a.params, "rb") as f:
        blob = pickle.load(f)

    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv

    def make_env():
        return AdvancedForestFireBulldozerEnv(
            blob["size"], blob["size"], key=jax.random.key(a.env_key),
            num_envs=a.envs, ca_repeat_mode=blob["ca_repeat_mode"],
            speed_multiplier=a.speed_multiplier,
        )

    env = make_env()
    policy = greedy_policy_fn(blob, env)
    r = run_episodes(env, lambda obs, k: policy(obs), a.steps, a.envs,
                     jax.random.key(0))
    r["policy"] = "trained-greedy"
    r["params"] = a.params
    r["env_key"] = a.env_key
    print(json.dumps(r), flush=True)

    if a.probes:
        def idle(obs, k):
            n = obs[1]["position"].shape[0]
            return jnp.tile(jnp.asarray([4, 0, 0], jnp.int32), (n, 1))

        def random_pol(obs, k):
            n = obs[1]["position"].shape[0]
            return jnp.stack(
                [jax.random.randint(k, (n,), 0, 9),
                 jax.random.randint(jax.random.fold_in(k, 1), (n,), 0, 2),
                 jnp.zeros((n,), jnp.int32)], axis=1)

        def greedy_fire(obs, k):
            ctx = obs[1]
            tg = ctx["per_env_context"]["true_grid"]
            fire = (tg == 2).astype(jnp.float32)
            h, w = fire.shape[1], fire.shape[2]
            tot = jnp.maximum(fire.sum((1, 2)), 1.0)
            rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
            cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
            cr = (fire * rows).sum((1, 2)) / tot
            cc = (fire * cols).sum((1, 2)) / tot
            pos = ctx["position"]
            dr = jnp.sign(cr - pos[:, 0].astype(jnp.float32)).astype(jnp.int32)
            dc = jnp.sign(cc - pos[:, 1].astype(jnp.float32)).astype(jnp.int32)
            move = (dr + 1) * 3 + (dc + 1)
            return jnp.stack(
                [move, jnp.ones_like(move), jnp.zeros_like(move)], axis=1)

        for name, fn in (("idle", idle), ("random", random_pol),
                         ("greedy-fire", greedy_fire)):
            r = run_episodes(make_env(), fn, a.steps, a.envs,
                             jax.random.key(0))
            r["policy"] = name
            r["env_key"] = a.env_key
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
