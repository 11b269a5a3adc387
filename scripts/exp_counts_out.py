#!/usr/bin/env python
"""Cheaper count extraction from the sparse kernel.

The (N,1,4) int32 SMEM-blocked output costs ~94us/step (exp_floor F vs C).
Variants:
  W1: SMEM output width 1 (packed counts) — does cost scale with bytes?
  DMA: counts written to SMEM scratch, explicitly DMA'd to an ANY HBM
       output with double buffering across programs.
  VMEMW: write counts as a VMEM (8,128)-padded block via one vector store
       per program (slot-major lanes), block (B,?) -> needs B<=... just try
       (B,4) f32? Mosaic may want (8,128) mult; use (B, 128) int32 padded.
"""
# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
H = W = 256
STEPS = 1000
P = 32
B = N // P


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


def scan_run(call, n_out):
    @jax.jit
    def run(grid):
        def body(carry, _):
            grid, = carry
            out = call(grid)
            return (out[0],), out[1].reshape(-1)[0].astype(jnp.int32)

        (grid,), c = jax.lax.scan(body, (grid,), None, length=STEPS)
        return c[-1:]

    return run


def build_w1():
    def kernel(grid_hbm, out_hbm, cnt):
        cnt[0, 0, 0] = jnp.int32(1)

    call = pl.pallas_call(
        kernel, grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec((B, 1, 1), lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((N, H, W), jnp.int8),
                   jax.ShapeDtypeStruct((N, 1, 1), jnp.int32)),
        input_output_aliases={0: 0},
    )
    return scan_run(call, 2)


def build_dma():
    def kernel(grid_hbm, out_hbm, cnt_hbm, scratch, sems):
        i = pl.program_id(0)
        buf = i % 2

        @pl.when(i >= 2)
        def _():
            pltpu.make_async_copy(
                scratch.at[buf], cnt_hbm.at[pl.ds(0, B)], sems.at[buf]
            ).wait()

        scratch[buf, 0, 0, 0] = jnp.int32(1)
        pltpu.make_async_copy(
            scratch.at[buf], cnt_hbm.at[pl.ds(i * B, B)], sems.at[buf]
        ).start()

        @pl.when(i == P - 1)
        def _():
            pltpu.make_async_copy(
                scratch.at[buf], cnt_hbm.at[pl.ds(0, B)], sems.at[buf]
            ).wait()

        @pl.when(i == P - 1)
        def _():
            pltpu.make_async_copy(
                scratch.at[1 - buf], cnt_hbm.at[pl.ds(0, B)], sems.at[1 - buf]
            ).wait()

    call = pl.pallas_call(
        kernel, grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(jax.ShapeDtypeStruct((N, H, W), jnp.int8),
                   jax.ShapeDtypeStruct((N, 1, 4), jnp.int32)),
        input_output_aliases={0: 0},
        scratch_shapes=[pltpu.SMEM((2, B, 1, 4), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return scan_run(call, 2)


def main():
    grid = jnp.zeros((N, H, W), jnp.int8)
    for name, b in [
        ("W1 SMEM width-1 out", build_w1),
        ("DMA double-buffered SMEM->HBM", build_dma),
    ]:
        try:
            dt = timeit(b(), grid)
            print(f"{name:32s}: {dt*1e6:7.1f} us/step", flush=True)
        except Exception as e:
            print(f"{name:32s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
