#!/usr/bin/env python
"""Can XLA do an in-place single-cell scatter into a scan-carried (N,H,W)
grid, or does it copy the full buffer per iteration?

Measures: scan body = scatter ~2000 single int8 cells into (4096,256,256).
Full-copy cost would be ~256MB/iter ≈ 300+ us; in-place ≈ ~10 us.
Also tests the combination with the aliased pallas kernel (scatter after
kernel on its output).
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


@jax.jit
def run_scatter_only(grid, key):
    def body(carry, k):
        grid, = carry
        rows = jax.random.randint(k, (N,), 0, H)
        cols = jax.random.randint(jax.random.fold_in(k, 1), (N,), 0, W)
        mask = jax.random.uniform(jax.random.fold_in(k, 2), (N,)) < 0.46
        envs = jnp.arange(N)
        # write `empty` where mask, else rewrite the current value (no-op)
        cur = grid[envs, rows, cols]
        val = jnp.where(mask, jnp.int8(0), cur)
        grid = grid.at[envs, rows, cols].set(val, unique_indices=True)
        return (grid,), cur.astype(jnp.int32).sum()

    (grid,), c = jax.lax.scan(body, (grid,), jax.random.split(key, STEPS))
    return c[-1:]


@jax.jit
def run_gather_only(grid, key):
    def body(carry, k):
        grid, = carry
        rows = jax.random.randint(k, (N,), 0, H)
        cols = jax.random.randint(jax.random.fold_in(k, 1), (N,), 0, W)
        cur = grid[jnp.arange(N), rows, cols]
        return (grid,), cur.astype(jnp.int32).sum()

    (grid,), c = jax.lax.scan(body, (grid,), jax.random.split(key, STEPS))
    return c[-1:]


@jax.jit
def run_kernel_plus_scatter(grid, key):
    """CA-only kernel (8% CA, no modify class) + XLA scatter for modifies."""
    def body(carry, k):
        grid, = carry
        u = jax.random.uniform(k, (N,))
        do_ca = u < 0.078
        is_mod = (u >= 0.078) & (u < 0.078 + 0.46)
        rows = jax.random.randint(jax.random.fold_in(k, 1), (N,), 0, H)
        cols = jax.random.randint(jax.random.fold_in(k, 2), (N,), 0, W)
        weights = jnp.where(
            jax.random.uniform(jax.random.fold_in(k, 3), (N, 8)) < 0.7,
            8, 0).astype(jnp.int32)
        # XLA-side modify: gather cell, decide hit, scatter empty
        cur = grid[jnp.arange(N), rows, cols]
        hit = is_mod & (cur == 3)
        val = jnp.where(hit, jnp.int8(0), cur)
        grid = grid.at[jnp.arange(N), rows, cols].set(val, unique_indices=True)
        params = jnp.stack(
            [do_ca.astype(jnp.int32), rows, cols, do_ca.astype(jnp.int32)],
            axis=-1)
        new_grid, counts = windy_fused_step(
            grid, weights, params, empty=0, tree=3, fire=25)
        return (new_grid.astype(grid.dtype),), counts[:, 0].sum()

    (grid,), c = jax.lax.scan(body, (grid,), jax.random.split(key, STEPS))
    return c[-1:]


def main():
    key = jax.random.key(0)
    grid = jax.random.choice(
        key, jnp.array([0, 3, 25], jnp.int8), (N, H, W),
        p=jnp.array([0.099, 0.9, 0.001]))
    for name, fn in [
        ("gather only", run_gather_only),
        ("scatter 4096 cells", run_scatter_only),
        ("kernel(CA only) + XLA scatter", run_kernel_plus_scatter),
    ]:
        dt = timeit(fn, grid, jax.random.key(1))
        print(f"{name:32s}: {dt*1e6:7.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
