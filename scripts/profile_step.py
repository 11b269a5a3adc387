#!/usr/bin/env python
"""Breakdown of the batched Bulldozer step on the real TPU.

Times (scan >=128 iters inside one jit, min over reps, host-fetch fence —
see .claude/skills/verify/SKILL.md):
  a) full step_batched
  b) sparse kernel alone (precomputed weights/params)
  c) per-env key derivation alone (threefry)
  d) epilogue-only (everything except kernel+derive)
"""
# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from gymca_tpu.envs.bulldozer import BulldozerCore
from gymca_tpu.ops.pallas_kernels import windy_fused_step, windy_weights_from_roll

SIZE = 256
N = 4096
STEPS = 1000


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    core = BulldozerCore(SIZE, SIZE)
    key = jax.random.key(0)
    keys = jax.random.split(key, N)
    states = jax.vmap(core.initial_state)(keys)

    # (a) full step
    @jax.jit
    def run_full(states, key):
        def body(carry, _):
            states, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.randint(k, (N, 2), 0, 2, dtype=jnp.int32)
            states, out = core.step_batched(states, actions)
            return (states, key), out.reward.sum()

        (states, _), r = jax.lax.scan(body, (states, key), None, length=STEPS)
        return r[-1:] + 0.0

    dt = timeit(run_full, states, key)
    print(f"full step_batched:  {dt*1e6:9.1f} us/step  ({N/dt/1e6:.2f} M env-steps/s)")

    # (b) kernel only
    wind = core._wind
    rolls = jax.random.uniform(key, (N, 3, 3))
    weights = windy_weights_from_roll(wind, rolls)
    params = jnp.zeros((N, 6), jnp.int32)
    # ~1/7 of envs fire the CA per step at 256^2 (t_step ~ 0.13)
    do_ca = (jnp.arange(N) % 7 == 0).astype(jnp.int32)
    params = params.at[:, 0].set(do_ca).at[:, 3].set(1 - do_ca)
    params = params.at[:, 1].set(100).at[:, 2].set(100)

    @jax.jit
    def run_kernel(grid, weights, params):
        def body(g, _):
            g, counts = windy_fused_step(
                g, weights, params, empty=0, tree=3, fire=25
            )
            return g, counts[0, 0]

        g, c = jax.lax.scan(body, grid, None, length=STEPS)
        return c[-1:]

    dt = timeit(run_kernel, states.grid, weights, params)
    print(f"kernel only (1/7 fire): {dt*1e6:5.1f} us/step")

    # (b2) kernel, all envs fire
    params_all = params.at[:, 0].set(1)
    dt = timeit(run_kernel, states.grid, weights, params_all)
    print(f"kernel only (all fire): {dt*1e6:5.1f} us/step")

    # (b3) kernel, no env fires (pure per-program overhead + modify tiles)
    params_none = params.at[:, 0].set(0)
    dt = timeit(run_kernel, states.grid, weights, params_none)
    print(f"kernel only (none fire, all shoot): {dt*1e6:5.1f} us/step")

    params_noop = params_none.at[:, 3].set(0)
    dt = timeit(run_kernel, states.grid, weights, params_noop)
    print(f"kernel only (pure no-op): {dt*1e6:5.1f} us/step")

    # (c) derive only
    def derive(key):
        carry, sub = jax.random.split(key)
        k_ca, _ = jax.random.split(sub)
        (k0,) = jax.random.split(k_ca, 1)
        roll = jax.random.uniform(k0, (3, 3), dtype=jnp.float32)
        return carry, roll

    @jax.jit
    def run_derive(keys):
        def body(keys, _):
            keys, rolls = jax.vmap(derive)(keys)
            return keys, rolls.sum()

        keys, s = jax.lax.scan(body, keys, None, length=STEPS)
        return s[-1:]

    dt = timeit(run_derive, states.key)
    print(f"derive only:        {dt*1e6:9.1f} us/step")

    # (d) weights-from-roll + params stack + epilogue arithmetic
    @jax.jit
    def run_epilogue(states, rolls):
        def body(carry, _):
            states = carry
            weights = windy_weights_from_roll(wind, rolls)
            counts = jnp.stack(
                [states.context["tree_count"], states.context["fire_count"],
                 jnp.zeros(N, jnp.int32), jnp.zeros(N, jnp.int32)], -1)
            t = counts[..., 0].astype(jnp.float32)
            f = counts[..., 1].astype(jnp.float32)
            reward = -(f / jnp.maximum(t + f, 1.0))
            return states, reward.sum() + weights.sum()

        states, r = jax.lax.scan(body, states, None, length=STEPS)
        return r[-1:]

    dt = timeit(run_epilogue, states, rolls)
    print(f"epilogue-ish:       {dt*1e6:9.1f} us/step")


if __name__ == "__main__":
    main()
