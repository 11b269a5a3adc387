#!/usr/bin/env python
"""A/B the fused Alexandridis kernel variants on hardware.

Times the kernel ALONE (grid+age carry, fixed terrain/wind consts) for each
box_mode, with the bench.py scan/min-of-reps harness and a 4-byte fence.

  python scripts/bench_fused_ca.py --size 256 --envs 64 [--tiled]
"""
from __future__ import annotations

# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--tiled", action="store_true")
    a = ap.parse_args()
    n, size = a.envs, a.size

    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv
    from gymca_tpu.ops.pallas_alexandridis import alexandridis_fused_step
    from gymca_tpu.ops.stencil import NEIGHBOR_OFFSETS, telescoped_box_coeffs

    env = AdvancedForestFireBulldozerEnv(
        size, size, key=jax.random.key(0), num_envs=n
    )
    obs, info = env.reset()
    per_env = obs[1]["per_env_context"]
    shared = obs[1]["shared_context"]
    ca = env.ca
    wm = shared["winds"][per_env["wind_index"]]
    wind_rows = jnp.stack(
        [wm[:, 1 + dr, 1 + dc] for dr, dc in NEIGHBOR_OFFSETS], axis=-1
    )
    coeffs = telescoped_box_coeffs(ca.burn_layer_weights)
    kw = dict(
        empty=env._empty, tree=env._tree, fire=env._fire,
        layer_coeffs=coeffs,
        dousing_border=float(ca._dousing_border),
        dousing_inner=float(ca._dousing_inner),
        fire_age_min=int(ca.fire_age_min),
        fire_age_max=int(ca.fire_age_max),
    )

    results = {"size": size, "envs": n,
               "device": jax.devices()[0].device_kind}
    modes = (["sat", "banded", "banded8", "banded8+no-boxes",
              "sat+no-prng", "sat+no-boxes", "sat+no-ignite"] if not a.tiled else ["tiled"])
    for mode in modes:
        mkw = dict(kw)
        if mode == "tiled":
            mkw["force_tiled"] = True
        else:
            base_mode, _, abl = mode.partition("+no-")
            mkw["box_mode"] = base_mode
            if abl:
                mkw["ablate"] = abl
        step = functools.partial(alexandridis_fused_step, **mkw)

        @jax.jit
        def run(grid, age, consts, key):
            dousing, vdf, slope, wind_rows = consts

            def body(c, k):
                grid, age = c
                seeds = jax.random.key_data(
                    jax.vmap(jax.random.fold_in, (None, 0))(
                        k, jnp.arange(n))).astype(jnp.int32)
                g2, a2 = step(grid, age, dousing, vdf, slope, wind_rows,
                              seeds)
                return (g2.astype(grid.dtype), a2), ()

            (grid, age), _ = jax.lax.scan(
                body, (grid, age), jax.random.split(key, a.steps))
            return (jnp.sum(grid.astype(jnp.int32)).astype(jnp.float32)
                    + jnp.sum(age))

        consts = (per_env["dousing_count"], per_env["veg_den_factor"],
                  per_env["exp_slope"], wind_rows)
        g0, age0 = per_env["true_grid"], per_env["fire_age"]
        key = jax.random.key(1)
        t0 = time.perf_counter()
        _ = float(run(g0, age0, consts, key))
        print(f"[ca-bench] {mode}: compile+first "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        _ = float(run(g0, age0, consts, jax.random.fold_in(key, 1)))
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            _ = float(run(g0, age0, consts, jax.random.fold_in(key, 2 + i)))
            best = min(best, time.perf_counter() - t0)
        us = best / a.steps * 1e6
        print(f"[ca-bench] {mode}: {us:.1f} us/step "
              f"({n * a.steps / best:,.0f} env-steps/s)",
              file=sys.stderr, flush=True)
        results[f"{mode}_us"] = round(us, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()


def dma_floor(size: int, envs: int, steps: int = 1000):
    """Pure-pipeline probe: identical in/out specs, trivial body — measures
    the DMA floor the real kernel pays before any compute."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w = envs, size, size

    def body(g, age, d, vdf, slope, og, oa):
        og[0] = g[0]
        oa[0] = age[0] + jnp.float32(1.0)

    vm = pltpu.VMEM
    blk = lambda shape, ix: pl.BlockSpec(shape, ix, memory_space=vm)  # noqa

    @jax.jit
    def run(g, age, d, vdf, slope, key):
        def step(c, _):
            g, age = c
            g2, a2 = pl.pallas_call(
                body,
                grid=(n,),
                in_specs=[
                    blk((1, h, w), lambda i: (i, 0, 0)),
                    blk((1, h, w), lambda i: (i, 0, 0)),
                    blk((1, h, w), lambda i: (i, 0, 0)),
                    blk((1, h, w), lambda i: (i, 0, 0)),
                    blk((1, 3, 3, h, w), lambda i: (i, 0, 0, 0, 0)),
                ],
                out_specs=(blk((1, h, w), lambda i: (i, 0, 0)),
                           blk((1, h, w), lambda i: (i, 0, 0))),
                out_shape=(jax.ShapeDtypeStruct((n, h, w), jnp.int8),
                           jax.ShapeDtypeStruct((n, h, w), jnp.float32)),
            )(g, age, d, vdf, slope)
            return (g2, a2), ()

        (g, age), _ = jax.lax.scan(step, (g, age), None, length=steps)
        return jnp.sum(age) + jnp.sum(g.astype(jnp.int32)).astype(jnp.float32)

    import time as _t
    g = jnp.zeros((n, h, w), jnp.int8)
    age = jnp.zeros((n, h, w), jnp.float32)
    d = jnp.zeros((n, h, w), jnp.int8)
    vdf = jnp.zeros((n, h, w), jnp.bfloat16)
    slope = jnp.zeros((n, 3, 3, h, w), jnp.bfloat16)
    key = jax.random.key(0)
    _ = float(run(g, age, d, vdf, slope, key))
    best = float("inf")
    for i in range(3):
        t0 = _t.perf_counter()
        _ = float(run(g, age, d, vdf, slope, key))
        best = min(best, _t.perf_counter() - t0)
    us = best / steps * 1e6
    print(f"[ca-bench] dma-floor: {us:.1f} us/step", file=sys.stderr)
    return us
