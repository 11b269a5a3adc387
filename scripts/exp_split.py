#!/usr/bin/env python
"""Attribute windy_fused_step time: CA-class vs modify-class vs prologue.

Drives windy_fused_step directly with synthetic work lists at controlled
class fractions (bench-realistic: ~8% CA, ~46% modify, rest noop), using the
scan-inside-jit timing recipe.
"""
# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from gymca_tpu.ops.pallas_kernels import windy_fused_step

N = 4096
H = W = 256
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


def make_runner(p_ca, p_mod):
    @jax.jit
    def run(grid, key):
        def body(carry, k):
            grid, = carry
            u = jax.random.uniform(k, (N,))
            do_ca = u < p_ca
            shoot = (u >= p_ca) & (u < p_ca + p_mod)
            rows = jax.random.randint(jax.random.fold_in(k, 1), (N,), 0, H)
            cols = jax.random.randint(jax.random.fold_in(k, 2), (N,), 0, W)
            weights = jnp.where(
                jax.random.uniform(jax.random.fold_in(k, 3), (N, 8)) < 0.7,
                8, 0).astype(jnp.int32)
            params = jnp.stack(
                [do_ca.astype(jnp.int32), rows, cols,
                 (shoot | do_ca).astype(jnp.int32)], axis=-1)
            new_grid, counts = windy_fused_step(
                grid, weights, params, empty=0, tree=3, fire=25)
            return (new_grid.astype(grid.dtype),), counts[:, 0].sum()

        (grid,), c = jax.lax.scan(body, (grid,), jax.random.split(key, STEPS))
        return c[-1:]

    return run


def main():
    key = jax.random.key(0)
    grid = jax.random.choice(
        key, jnp.array([0, 3, 25], jnp.int8), (N, H, W),
        p=jnp.array([0.099, 0.9, 0.001]))
    for name, p_ca, p_mod in [
        ("noop only (prologue+launch)", 0.0, 0.0),
        ("bench-real  8% CA, 46% mod", 0.078, 0.46),
        ("CA only     8% CA,  0% mod", 0.078, 0.0),
        ("mod only    0% CA, 46% mod", 0.0, 0.46),
        ("all CA    100% CA", 1.0, 0.0),
        ("all mod     0% CA, 100% mod", 0.0, 1.0),
    ]:
        dt = timeit(make_runner(p_ca, p_mod), grid, jax.random.key(1))
        print(f"{name:30s}: {dt*1e6:7.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
