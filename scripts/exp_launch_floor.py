#!/usr/bin/env python
"""Isolate: (a) pallas launch floor (no-op kernel, precomputed inputs),
(b) the XLA partition/pack cost alone (varying input, no kernel)."""
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
B = 128
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


def kernel(grid_hbm, b_ref, p_ref, out_hbm, cnt_ref, g_vmem, sem):
    pass  # absolute no-op


@jax.jit
def run_launch(grid, bounds, packed):
    def body(g, _):
        g2, counts = pl.pallas_call(
            kernel,
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1, 4), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((B, 1, 16), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((B, 1, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((N, H, W), jnp.int8),
                jax.ShapeDtypeStruct((N, 1, 4), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((B, H, W), jnp.int8),
                pltpu.SemaphoreType.DMA((B,)),
            ],
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(g, bounds, packed)
        return g2, counts[0, 0, 0]

    g, c = jax.lax.scan(body, grid, None, length=STEPS)
    return c[-1:]


@jax.jit
def run_partition(params_seed):
    def body(carry, _):
        params = carry
        do_ca = params[:, 0] > 0
        shoot = params[:, 3] > 0
        is_modify = jnp.logical_not(do_ca) & shoot
        ca_i = do_ca.astype(jnp.int32)
        mod_i = is_modify.astype(jnp.int32)
        noop_i = 1 - ca_i - mod_i
        n_ca = jnp.sum(ca_i)
        n_active = n_ca + jnp.sum(mod_i)
        slot = (ca_i * (jnp.cumsum(ca_i) - 1)
                + mod_i * (n_ca + jnp.cumsum(mod_i) - 1)
                + noop_i * (n_active + jnp.cumsum(noop_i) - 1))
        perm = jnp.zeros((N,), jnp.int32).at[slot].set(
            jnp.arange(N, dtype=jnp.int32), unique_indices=True)
        packed = jnp.concatenate(
            [params.astype(jnp.int32), jnp.zeros((N, 12), jnp.int32)], -1
        )[perm]
        # vary params so the loop body can't be hoisted
        new_params = params.at[:, 0].set((params[:, 0] + packed[:, 1]) % 2)
        return new_params, packed[0, 0]

    p, c = jax.lax.scan(body, params_seed, None, length=STEPS)
    return c[-1:]


def make_run_launch(n, smem_only=False):
    @jax.jit
    def run(grid, bounds, packed):
        def body(g, _):
            ins = [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1, 4), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((B, 1, 16), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ]
            outs = (
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((B, 1, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            )
            g2, counts = pl.pallas_call(
                kernel,
                grid=(n // B,),
                in_specs=ins,
                out_specs=outs,
                out_shape=(
                    jax.ShapeDtypeStruct((n, H, W), jnp.int8),
                    jax.ShapeDtypeStruct((n, 1, 4), jnp.int32),
                ),
                scratch_shapes=[
                    pltpu.VMEM((B, H, W), jnp.int8),
                    pltpu.SemaphoreType.DMA((B,)),
                ],
                input_output_aliases={0: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(g, bounds, packed)
            return g2, counts[0, 0, 0]
        g, c = jax.lax.scan(body, grid, None, length=STEPS)
        return c[-1:]
    return run


def kernel_smem(b_ref, p_ref, cnt_ref):
    pass


@jax.jit
def run_smem_only(bounds, packed):
    def body(carry, _):
        counts = pl.pallas_call(
            kernel_smem,
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((1, 1, 4), lambda i: (0, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((B, 1, 16), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((B, 1, 4), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((N, 1, 4), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(bounds, packed)
        return carry, counts[0, 0, 0]
    c0, c = jax.lax.scan(body, 0, None, length=STEPS)
    return c[-1:]


def main():
    bounds = jnp.zeros((1, 1, 4), jnp.int32)
    packed = jnp.zeros((N, 1, 16), jnp.int32)

    for n in (512, 4096):
        grid = jnp.zeros((n, H, W), jnp.int8)
        dt = timeit(make_run_launch(n), grid, bounds, packed)
        print(f"launch floor n={n}: {dt*1e6:7.1f} us/step", flush=True)

    dt = timeit(run_smem_only, bounds, packed)
    print(f"launch floor smem-only:      {dt*1e6:7.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
