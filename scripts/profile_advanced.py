#!/usr/bin/env python
"""Advanced-env step component breakdown on the real TPU (1000-step scans).

Times, per step at N envs of SIZE^2:
  a) full stateless_step + conditional_reset (XLA CA / fused Pallas CA)
  b) fused CA kernel alone
  c) obs pipeline alone (build_observation_on_extensions + rgb)
"""
# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp

N_ENVS = int(os.environ.get("ADV_ENVS", 8))
SIZE = 256
STEPS = 1000


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv
    from gymca_tpu.ops.pallas_alexandridis import alexandridis_fused_step
    from gymca_tpu.ops.stencil import NEIGHBOR_OFFSETS, telescoped_box_coeffs

    env = AdvancedForestFireBulldozerEnv(
        SIZE, SIZE, key=jax.random.key(0), num_envs=N_ENVS, use_pallas_ca=True
    )
    obs, info = env.reset()
    per_env = obs[1]["per_env_context"]
    shared = obs[1]["shared_context"]
    ca = env.ca

    # (b) fused CA kernel alone
    wm = shared["winds"][per_env["wind_index"]]
    wind_rows = jnp.stack(
        [wm[:, 1 + dr, 1 + dc] for dr, dc in NEIGHBOR_OFFSETS], axis=-1
    )
    seeds = jnp.tile(jnp.asarray([[5, 9]], jnp.int32), (N_ENVS, 1))

    @jax.jit
    def run_kernel(grid, age, dous, vdf, es, wind_rows, seeds):
        def body(carry, _):
            grid, age = carry
            g2, a2 = alexandridis_fused_step(
                grid, age, dous, vdf, es, wind_rows, seeds,
                empty=0, tree=1, fire=2,
                layer_coeffs=telescoped_box_coeffs(ca.burn_layer_weights),
                dousing_border=float(ca._dousing_border),
                dousing_inner=float(ca._dousing_inner),
                fire_age_min=int(ca.fire_age_min),
                fire_age_max=int(ca.fire_age_max),
            )
            return (g2.astype(grid.dtype), a2.astype(age.dtype)), g2[0, 0, 0]

        (g, a), c = jax.lax.scan(
            body, (grid, age), None, length=STEPS
        )
        return c[-1:]

    dt = timeit(
        run_kernel, per_env["true_grid"].astype(jnp.int32),
        per_env["fire_age"].astype(jnp.float32),
        per_env["dousing_count"].astype(jnp.int32),
        per_env["veg_den_factor"].astype(jnp.float32),
        per_env["exp_slope"].astype(jnp.float32),
        wind_rows, seeds,
    )
    print(f"fused CA kernel alone: {dt*1e6:7.1f} us/step "
          f"({dt*1e6/N_ENVS:.2f} us/env)", flush=True)

    # (c) obs pipeline alone
    acts = jnp.zeros((N_ENVS, 3), jnp.int32)
    positions = jnp.tile(jnp.asarray([[5, 7]]), (N_ENVS, 1))

    @jax.jit
    def run_obs(grid, per_env):
        def body(carry, _):
            rgb, ext = jax.vmap(
                env.build_observation_on_extensions,
                in_axes=(0, 0, 0, env._per_env_in_axes(), None),
            )(grid, positions, acts, per_env, shared)
            return carry, rgb.astype(jnp.float32).sum()

        c, r = jax.lax.scan(body, 0, None, length=STEPS)
        return r[-1:]

    dt = timeit(run_obs, per_env["true_grid"], per_env)
    print(f"obs pipeline alone:    {dt*1e6:7.1f} us/step", flush=True)

    # (a) full step both modes — reuse bench_advanced
    import subprocess
    import sys


if __name__ == "__main__":
    main()
