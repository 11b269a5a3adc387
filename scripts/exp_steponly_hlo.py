#!/usr/bin/env python
"""Dump optimized HLO for the Advanced step scan with/without
conditional_reset to find why step-only compiles ~15x slower
(see exp_advanced_split.py)."""
from __future__ import annotations

# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys

import jax
import jax.numpy as jnp

from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--variant", choices=("full", "step_only"),
                    default="step_only")
    a = ap.parse_args()
    n = a.envs

    env = AdvancedForestFireBulldozerEnv(
        a.size, a.size, key=jax.random.key(0), num_envs=n
    )
    obs, info = env.reset()

    def acts(k):
        return jnp.stack(
            [jax.random.randint(k, (n,), 0, 9),
             jax.random.randint(jax.random.fold_in(k, 1), (n,), 0, 2),
             jnp.zeros((n,), jnp.int32)], axis=1)

    def body(c, k):
        obs, info = c
        aa = acts(k)
        st = env.stateless_step(aa, obs, info)
        if a.variant == "full":
            o2, _, _, _, i2 = env.conditional_reset(st, aa)
        else:
            o2, i2 = st[0], st[4]
        return (o2, i2), ()

    @jax.jit
    def run(carry, key):
        c, _ = jax.lax.scan(body, carry, jax.random.split(key, a.steps))
        return jax.tree.reduce(
            lambda acc, x: acc + jnp.sum(x).astype(jnp.float32),
            jax.tree.map(
                lambda x: (jax.random.key_data(x)
                           if jnp.issubdtype(x.dtype, jax.dtypes.prng_key)
                           else x).astype(jnp.float32)
                if not jnp.issubdtype(x.dtype, jnp.floating) else x,
                c),
            jnp.float32(0.0))

    lowered = run.lower((obs, info), jax.random.key(1))
    compiled = lowered.compile()
    print(compiled.as_text())
    print("=== cost analysis ===", file=sys.stderr)
    try:
        print(compiled.cost_analysis(), file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(e, file=sys.stderr)


if __name__ == "__main__":
    main()
