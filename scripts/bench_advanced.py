#!/usr/bin/env python
"""Honest Advanced-env step timing: XLA CA vs fused Pallas CA.

1000-step scan inside one jit (the ~27 ms tunnel dispatch otherwise
dominates shorter scans), min over reps, host-fetch fence.
"""
# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

N_ENVS = 8
SIZE = 256
STEPS = 1000


def measure(use_pallas: bool) -> float:
    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv

    env = AdvancedForestFireBulldozerEnv(
        SIZE, SIZE, key=jax.random.key(0), num_envs=N_ENVS,
        use_pallas_ca=use_pallas,
    )
    obs, info = env.reset()

    @jax.jit
    def run(obs, info, key):
        def body(carry, k):
            obs, info = carry
            acts = jnp.stack(
                [jax.random.randint(k, (N_ENVS,), 0, 9),
                 jax.random.randint(jax.random.fold_in(k, 1), (N_ENVS,), 0, 2),
                 jnp.zeros((N_ENVS,), jnp.int32)], axis=1)
            step_tuple = env.stateless_step(acts, obs, info)
            obs2, _, _, _, info2 = env.conditional_reset(step_tuple, acts)
            return (obs2, info2), step_tuple[1].sum()

        (obs, info), r = jax.lax.scan(
            body, (obs, info), jax.random.split(key, STEPS)
        )
        return r[-1:]

    out = run(obs, info, jax.random.key(1))
    _ = float(out[0])
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        out = run(obs, info, jax.random.key(2 + i))
        _ = float(out[0])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    for use_pallas in (False, True):
        dt = measure(use_pallas)
        name = "fused Pallas CA" if use_pallas else "XLA CA"
        print(
            f"advanced {SIZE}^2 x {N_ENVS} envs, {name}: "
            f"{dt*1e3:7.3f} ms/step ({N_ENVS/dt:,.0f} env-steps/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
