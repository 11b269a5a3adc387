#!/usr/bin/env python
"""What makes the sparse kernel's ~175us/step floor?

Variants of an (almost) no-op pallas call over the same (4096,256,256) int8
HBM grid, scanned 1000 steps inside one jit:
  A. empty kernel, grid ANY in/out aliased, no SMEM inputs
  B. + (P,1,4) SMEM bounds
  C. + (N,1,16) SMEM table (current shape)
  D. + (N,1,8) SMEM table (half width)
  E. C with P=16 / 64 programs
  F. C + counts SMEM output (current output shape)
"""
# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def build(table_w: int | None, P: int, with_counts: bool):
    B = N // P

    def kernel(*refs):
        i = 0
        grid_hbm = refs[i]; i += 1
        if table_w is not None:
            b_ref = refs[i]; i += 1
            p_ref = refs[i]; i += 1
        out_hbm = refs[i]; i += 1
        if with_counts:
            cnt = refs[i]; i += 1
            cnt[0, 0, 0] = jnp.int32(1)
        del grid_hbm, out_hbm

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = []
    if table_w is not None:
        in_specs += [
            pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1, table_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
        args = [jnp.zeros((P, 1, 4), jnp.int32),
                jnp.zeros((N, 1, table_w), jnp.int32)]
    if with_counts:
        out_shape = (jax.ShapeDtypeStruct((N, H, W), jnp.int8),
                     jax.ShapeDtypeStruct((N, 1, 4), jnp.int32))
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec((B, 1, 4), lambda i: (i, 0, 0),
                                  memory_space=pltpu.SMEM))
    else:
        out_shape = jax.ShapeDtypeStruct((N, H, W), jnp.int8)
        out_specs = pl.BlockSpec(memory_space=pl.ANY)

    call = pl.pallas_call(
        kernel, grid=(P,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, input_output_aliases={0: 0},
    )

    @jax.jit
    def run(grid):
        def body(carry, _):
            grid, = carry
            out = call(grid, *args)
            g = out[0] if with_counts else out
            return (g,), (out[1][0, 0, 0] if with_counts else jnp.int32(0))

        (grid,), c = jax.lax.scan(body, (grid,), None, length=STEPS)
        return c[-1:]

    return run


def main():
    grid = jnp.zeros((N, H, W), jnp.int8)
    for name, tw, P, wc in [
        ("A empty, no SMEM, P=32", None, 32, False),
        ("B bounds only, P=32", 0, 32, False),
        ("C +table w16, P=32", 16, 32, False),
        ("D +table w8, P=32", 8, 32, False),
        ("E1 table w16, P=16", 16, 16, False),
        ("E2 table w16, P=64", 16, 64, False),
        ("F full shapes (w16+counts) P=32", 16, 32, True),
        ("G full shapes (w8+counts) P=32", 8, 32, True),
    ]:
        if tw == 0:
            tw = 1  # minimal table stand-in for "bounds only"
        dt = timeit(build(tw, P, wc), grid)
        print(f"{name:34s}: {dt*1e6:7.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
