#!/usr/bin/env python
"""Can XLA gather/scatter of single agent cells beat the kernel tile path?
(N,H,W) int8 grids; per env one dynamic cell read-modify-write per step."""
# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

N, H, W = 4096, 256, 256
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
def run_rmw(grid, rows, cols):
    def body(g, _):
        cells = jax.vmap(
            lambda gi, r, c: jax.lax.dynamic_slice(gi, (r, c), (1, 1))
        )(g, rows, cols)[:, 0, 0]
        hit = cells == 3
        newc = jnp.where(hit, 0, cells).astype(g.dtype)
        g = jax.vmap(
            lambda gi, r, c, v: jax.lax.dynamic_update_slice(
                gi, v[None, None], (r, c)
            )
        )(g, rows, cols, newc)
        return g, jnp.sum(hit.astype(jnp.int32))

    g, h = jax.lax.scan(body, grid, None, length=STEPS)
    return h[-1:]


@jax.jit
def run_gather_only(grid, rows, cols):
    def body(g, _):
        cells = jax.vmap(
            lambda gi, r, c: jax.lax.dynamic_slice(gi, (r, c), (1, 1))
        )(g, rows, cols)[:, 0, 0]
        return g, jnp.sum((cells == 3).astype(jnp.int32))

    g, h = jax.lax.scan(body, grid, None, length=STEPS)
    return h[-1:]


def main():
    key = jax.random.key(0)
    grid = jax.random.choice(
        key, jnp.asarray([0, 3, 25], jnp.int8), (N, H, W)
    )
    rows = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, H)
    cols = jax.random.randint(jax.random.fold_in(key, 2), (N,), 0, W)

    dt = timeit(run_gather_only, grid, rows, cols)
    print(f"xla gather only : {dt*1e6:7.1f} us/step", flush=True)
    dt = timeit(run_rmw, grid, rows, cols)
    print(f"xla gather+scatter: {dt*1e6:7.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
