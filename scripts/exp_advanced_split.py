#!/usr/bin/env python
"""Phase attribution for the Advanced env step (VERDICT r3 weak #1).

Measures, with the same 1000-step-scan/min-of-reps harness as bench.py, the
cost of each phase of the 256²/64-env Advanced step so the 158k-steps/s
number has a roofline story like the windy kernel's 281/189/175 µs split:

  full        stateless_step + conditional_reset   (the bench-of-record)
  step_only   stateless_step alone                 (full - reset overhead)
  no_obs      stateless_step with the RGB/extended obs epilogue REPLACED by
              a zero-obs passthrough (CA + move/dousing + day-night only)
  obs_only    the vmapped build_observation_on_extensions epilogue alone on
              fixed inputs (palette select + dousing tint + agent pixel)

Run on the real chip:  python scripts/exp_advanced_split.py --size 256 --envs 64
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def scan_time(fn, carry, steps, reps=3):
    import jax

    @jax.jit
    def run(carry, key):
        def body(c, k):
            return fn(c, k), ()

        c, _ = jax.lax.scan(body, carry, jax.random.split(key, steps))
        return c

    key = jax.random.key(1)
    c = run(carry, key)
    _ = jax.tree.flatten(jax.device_get(jax.tree.leaves(c)[0]))  # sync
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        c = run(carry, jax.random.fold_in(key, i + 2))
        _ = jax.device_get(jax.tree.leaves(c)[0])
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1000)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv

    env = AdvancedForestFireBulldozerEnv(
        a.size, a.size, key=jax.random.key(0), num_envs=a.envs
    )
    print(f"[split] size={a.size} envs={a.envs} "
          f"path={'fused-pallas' if env.use_pallas_ca else 'xla'} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    obs, info = env.reset()
    n = a.envs

    def acts(k):
        return jnp.stack(
            [jax.random.randint(k, (n,), 0, 9),
             jax.random.randint(jax.random.fold_in(k, 1), (n,), 0, 2),
             jnp.zeros((n,), jnp.int32)], axis=1)

    # --- full: step + conditional_reset -------------------------------------
    def full(carry, k):
        obs, info = carry
        st = env.stateless_step(acts(k), obs, info)
        o2, _, _, _, i2 = env.conditional_reset(st, acts(k))
        return (o2, i2)

    t_full = scan_time(full, (obs, info), a.steps)

    # --- step only -----------------------------------------------------------
    def step_only(carry, k):
        obs, info = carry
        o2, _, _, _, i2 = env.stateless_step(acts(k), obs, info)
        return (o2, i2)

    t_step = scan_time(step_only, (obs, info), a.steps)

    # --- step with obs epilogue stubbed out ----------------------------------
    real_build = env.build_observation_on_extensions

    def zero_build(grid, position, full_action, per_env, shared):
        # match the env's real obs dtypes (uint8 RGB since QUIRKS #13) so
        # the scan carry types line up with the reset() obs
        rgb = jnp.zeros(grid.shape + (3,), env._obs_dtype)
        ext = jnp.zeros(grid.shape + (3 + 2,), jnp.float32)
        return rgb, ext

    env.build_observation_on_extensions = zero_build
    env.stateless_step = jax.jit(env._step_impl)  # fresh cache
    t_noobs = scan_time(step_only, (obs, info), a.steps)
    env.build_observation_on_extensions = real_build
    env.stateless_step = jax.jit(env._step_impl)

    # --- obs epilogue alone ---------------------------------------------------
    per_env = obs[1]["per_env_context"]
    shared = obs[1]["shared_context"]
    pos = obs[1]["position"]
    tg = per_env["true_grid"]

    def obs_only(carry, k):
        grid = carry
        fa = acts(k)
        rgb, ext = jax.vmap(
            lambda g, p, aa, pe: env.build_observation_on_extensions(
                g, p, aa, pe, shared
            ),
            in_axes=(0, 0, 0, env._per_env_in_axes()),
        )(grid, pos, fa, per_env)
        # feed a data dependency forward so nothing DCEs
        return grid ^ (rgb[..., 0] > 1e9).astype(grid.dtype)

    t_obs = scan_time(obs_only, tg, a.steps)

    us = lambda t: round(t * 1e6, 1)
    out = {
        "size": a.size, "envs": a.envs,
        "full_us": us(t_full),
        "step_only_us": us(t_step),
        "reset_overhead_us": us(t_full - t_step),
        "step_no_obs_us": us(t_noobs),
        "obs_epilogue_in_situ_us": us(t_step - t_noobs),
        "obs_epilogue_isolated_us": us(t_obs),
        "steps_per_sec_full": round(a.envs / t_full, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
