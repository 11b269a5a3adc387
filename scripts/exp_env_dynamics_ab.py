#!/usr/bin/env python
"""A/B the Advanced env DYNAMICS against the reference's own JAX env.

Steps gymca_tpu's AdvancedForestFireBulldozerEnv and the reference's
AdvancedForestFireBulldozerEnv (/root/reference, runs unmodified as an env —
only its *trainer* needs shims) side by side from their own resets with the
same hand policy and NO auto-reset, recording:

* fire/tree cell-count trajectories at checkpoints (mean ± std over envs);
* the per-env burnout (done) time distribution.

PRNG streams differ between the two implementations, so the comparison is
distributional, not bit-wise — the question it answers is whether episode
statistics (burnout times, fire-load) agree, i.e. whether a learning-curve
gap in the head-to-head could be a *dynamics* gap rather than a trainer gap.

Usage: python scripts/exp_env_dynamics_ab.py --size 64 --envs 8 \
           --steps 3000 --policy idle
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp


def make_policy(name, n_heads):
    def idle(obs, k):
        n = obs[1]["position"].shape[0]
        a = jnp.zeros((n, n_heads), jnp.int32)
        return a.at[:, 0].set(4)

    def random_pol(obs, k):
        n = obs[1]["position"].shape[0]
        cols = [jax.random.randint(k, (n,), 0, 9),
                jax.random.randint(jax.random.fold_in(k, 1), (n,), 0, 2)]
        cols += [jnp.zeros((n,), jnp.int32)] * (n_heads - 2)
        return jnp.stack(cols, axis=1)

    return {"idle": idle, "random": random_pol}[name]


def run(env, obs, info, policy, steps, chunk, fire_value):
    """Step WITHOUT auto-reset; fire counts at chunk boundaries + burnout
    times.  Returns (fire_counts [n_chunks, n_envs], done_time [n_envs])."""

    @jax.jit
    def do_chunk(carry, ck):
        obs, info, done, t, donetime = carry

        def body(c, k):
            obs, info, done, t, donetime = c
            a = policy(obs, k)
            obs2, r, term, trunc, info2 = env.stateless_step(a, obs, info)
            done2 = done | term
            donetime = jnp.where(done2 & ~done, t, donetime)
            return (obs2, info2, done2, t + 1, donetime), None

        (obs, info, done, t, donetime), _ = jax.lax.scan(
            body, (obs, info, done, t, donetime), jax.random.split(ck, chunk)
        )
        fires = (obs[1]["per_env_context"]["true_grid"] == fire_value).sum(
            (-2, -1)
        )
        return (obs, info, done, t, donetime), fires

    n = obs[1]["position"].shape[0]
    carry = (obs, info, jnp.zeros(n, bool), jnp.zeros((), jnp.int32),
             jnp.full(n, -1, jnp.int32))
    n_chunks = steps // chunk
    carry, fires = jax.lax.scan(
        lambda c, k: do_chunk(c, k), carry,
        jax.random.split(jax.random.key(17), n_chunks),
    )
    donetime = carry[4]
    return jax.device_get(fires), jax.device_get(donetime)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--policy", choices=("idle", "random"), default="idle")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the box's sitecustomize "
                         "pins the axon TPU platform via jax.config, which "
                         "env vars cannot override)")
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    out = {"config": vars(a)}

    # ---- ours
    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv

    env = AdvancedForestFireBulldozerEnv(
        a.size, a.size, key=jax.random.key(0), num_envs=a.envs,
        enable_extensions=False,
    )
    obs, info = env.reset()
    pol = make_policy(a.policy, 3)
    fires, donetime = run(env, obs, info, pol, a.steps, a.chunk, env._fire)
    out["gymca_tpu"] = {
        "fire_mean_by_chunk": fires.mean(1).round(1).tolist(),
        "fire_std_by_chunk": fires.std(1).round(1).tolist(),
        "burnout_times": donetime.tolist(),
    }
    print("[ab] ours:", out["gymca_tpu"]["fire_mean_by_chunk"][:8], "...",
          "burnout", sorted(donetime.tolist()), flush=True)

    # ---- reference
    if not a.skip_reference:
        sys.path.insert(0, "/root/reference")
        import gym_cellular_automata as gymca_ref

        ProtoEnv = gymca_ref.prototypes[2]
        renv = ProtoEnv(
            nrows=a.size, ncols=a.size, key=jax.random.key(0),
            num_envs=a.envs, use_hidden=True, middle_fire=False,
            enable_extensions=False,
        )
        robs, rinfo = renv.reset()
        rfires, rdonetime = run(renv, robs, rinfo, pol, a.steps, a.chunk,
                                renv._fire)
        out["reference"] = {
            "fire_mean_by_chunk": rfires.mean(1).round(1).tolist(),
            "fire_std_by_chunk": rfires.std(1).round(1).tolist(),
            "burnout_times": rdonetime.tolist(),
        }
        print("[ab] ref :", out["reference"]["fire_mean_by_chunk"][:8], "...",
              "burnout", sorted(rdonetime.tolist()), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
