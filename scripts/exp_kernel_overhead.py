#!/usr/bin/env python
"""Experiment: where does the sparse kernel's fixed overhead live?

Variants of a no-op/minimal kernel over (N, H, W) int8 grids with different
envs-per-program B and SMEM layouts, timed with the scan-inside-jit recipe.
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

N, H, W = 4096, 256, 256
STEPS = 120


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


def make_noop(B, n_smem_blocks):
    """Pure no-op kernel: reads params, writes counts, touches no grid."""

    def kernel(*refs):
        p_ref = refs[1]
        cnt_ref = refs[-1]
        for b in range(B):
            cnt_ref[b, 0, 0] = p_ref[b, 0, 4]
            cnt_ref[b, 0, 1] = p_ref[b, 0, 5]
            cnt_ref[b, 0, 2] = 0
            cnt_ref[b, 0, 3] = 0

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    in_specs += [
        pl.BlockSpec((B, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    ] * n_smem_blocks

    @jax.jit
    def run(grid, params):
        def body(g, _):
            g2, counts = pl.pallas_call(
                kernel,
                grid=(N // B,),
                in_specs=in_specs,
                out_specs=(
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((B, 1, 4), lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((N, H, W), jnp.int8),
                    jax.ShapeDtypeStruct((N, 1, 4), jnp.int32),
                ),
                input_output_aliases={0: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(g, *([params] * n_smem_blocks))
            return g2, counts[0, 0, 0]

        g, c = jax.lax.scan(body, grid, None, length=STEPS)
        return c[-1:]

    return run


def make_noop_fori(B):
    """No-op with a fori_loop over envs instead of an unrolled python loop."""

    def kernel(grid_hbm, p_ref, out_hbm, cnt_ref):
        def body(b, _):
            cnt_ref[b, 0, 0] = p_ref[b, 0, 4]
            cnt_ref[b, 0, 1] = p_ref[b, 0, 5]
            cnt_ref[b, 0, 2] = 0
            cnt_ref[b, 0, 3] = 0
            return 0

        jax.lax.fori_loop(0, B, body, 0)

    @jax.jit
    def run(grid, params):
        def body(g, _):
            g2, counts = pl.pallas_call(
                kernel,
                grid=(N // B,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((B, 1, 8), lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=(
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((B, 1, 4), lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((N, H, W), jnp.int8),
                    jax.ShapeDtypeStruct((N, 1, 4), jnp.int32),
                ),
                input_output_aliases={0: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(g, params)
            return g2, counts[0, 0, 0]

        g, c = jax.lax.scan(body, grid, None, length=STEPS)
        return c[-1:]

    return run


def main():
    grid = jnp.zeros((N, H, W), jnp.int8)

    for B in (32, 128):
        params = jnp.zeros((N, 1, 8), jnp.int32)
        dt = timeit(make_noop(B, 2), grid, params)
        print(f"noop unrolled B={B:4d} 2 smem blocks: {dt*1e6:8.1f} us/step", flush=True)

    for B in (512, 4096,):
        params = jnp.zeros((N, 1, 8), jnp.int32)
        dt = timeit(make_noop_fori(B), grid, params)
        print(f"noop fori     B={B:4d} 1 smem block:  {dt*1e6:8.1f} us/step")


if __name__ == "__main__":
    main()
