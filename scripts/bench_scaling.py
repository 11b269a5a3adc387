#!/usr/bin/env python
"""Scaling-efficiency harness: env-steps/s vs device count.

The BASELINE north star is ">=10M env-steps/s aggregate across >=2 hosts
with >=80% scaling efficiency from 1 chip".  This harness makes that a
one-command measurement the moment multi-chip hardware exists:

  * sweeps mesh sizes d = 1, 2, 4, ..., N over the available devices,
  * WEAK scaling: a fixed per-device env batch (the production regime —
    more chips run more envs), stepped through the same fused/vmapped
    Bulldozer step `bench.py` measures, sharded with shard_map over a
    ('data',) mesh exactly like `gymca_tpu.parallel`,
  * emits one JSON line per mesh size:
      {"devices": d, "steps_per_sec": v, "efficiency": v / (d * v_1)}
    where v_1 is the single-device throughput of the same per-device batch.

On this box it runs on the virtual CPU mesh (XLA_FLAGS=
--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu) to validate
shape-correctness and the efficiency arithmetic; CPU efficiency numbers are
NOT hardware claims (all "devices" share the same cores).  On a real TPU
pod the same command produces the scaling datum.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/bench_scaling.py --envs-per-device 64 --steps 50
  python scripts/bench_scaling.py                 # real chips, full steps
"""

from __future__ import annotations

# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def measure(core, mesh, num_envs: int, steps: int, use_fused: bool):
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from gymca_tpu.parallel.mesh import shard_env_batch
    from gymca_tpu.parallel.sharded import shard_map

    states = jax.vmap(core.initial_state)(
        jax.random.split(jax.random.key(0), num_envs)
    )
    inner = (
        functools.partial(core.step_batched)
        if use_fused
        else jax.vmap(core.step)
    )
    if mesh is not None:
        states = shard_env_batch(mesh, states)
        out_struct = jax.eval_shape(
            inner, states, jnp.zeros((num_envs, 2), jnp.int32)
        )
        step = shard_map(
            inner, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P("data"), states), P("data")),
            out_specs=jax.tree.map(lambda _: P("data"), out_struct),
        )
    else:
        step = inner

    def body(carry, _):
        states, key = carry
        key, k_act = jax.random.split(key)
        actions = jnp.stack(
            [jax.random.randint(k_act, (num_envs,), 0, 9, dtype=jnp.int32),
             jax.random.randint(jax.random.fold_in(k_act, 1), (num_envs,), 0, 2,
                                dtype=jnp.int32)],
            axis=1,
        )
        states, out = step(states, actions)
        return (states, key), out.reward.sum()

    @jax.jit
    def run(states, key):
        (states, _), rewards = jax.lax.scan(
            body, (states, key), None, length=steps
        )
        return states, rewards

    key = jax.random.key(7)
    _, r = run(states, key)
    _ = float(r[-1])  # compile + settle
    _, r = run(states, jax.random.fold_in(key, 1))
    _ = float(r[-1])
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        _, r = run(states, jax.random.fold_in(key, 2 + i))
        _ = float(r[-1])
        best = min(best, time.perf_counter() - t0)
    return (num_envs * steps) / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--envs-per-device", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--max-devices", type=int, default=None)
    a = ap.parse_args()

    import jax

    from gymca_tpu.envs.bulldozer import BulldozerCore
    from gymca_tpu.parallel.mesh import make_mesh

    n_avail = len(jax.devices())
    if a.max_devices:
        n_avail = min(n_avail, a.max_devices)
    core = BulldozerCore(a.size, a.size)
    # fused Pallas only on real TPUs; the CPU validation mesh runs XLA
    use_fused = core.supports_fused_step() and jax.default_backend() == "tpu"
    print(
        f"[scaling] backend={jax.default_backend()} devices={n_avail} "
        f"size={a.size} envs/device={a.envs_per_device} steps={a.steps} "
        f"path={'fused-pallas' if use_fused else 'vmapped-XLA'}",
        file=sys.stderr,
    )

    sizes = [1]
    while sizes[-1] * 2 <= n_avail:
        sizes.append(sizes[-1] * 2)
    if sizes[-1] != n_avail:
        sizes.append(n_avail)

    v1 = None
    results = []
    for d in sizes:
        mesh = make_mesh(d) if d > 1 else None
        v = measure(core, mesh, a.envs_per_device * d, a.steps, use_fused)
        if v1 is None:
            v1 = v
        eff = v / (d * v1)
        rec = {
            "devices": d,
            "steps_per_sec": round(v, 1),
            "efficiency": round(eff, 4),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # single summary line for drivers
    print(json.dumps({
        "metric": f"bulldozer{a.size}_scaling_efficiency",
        "value": results[-1]["efficiency"],
        "unit": f"fraction-of-linear@{results[-1]['devices']}dev",
        "vs_baseline": results[-1]["steps_per_sec"],
    }))


if __name__ == "__main__":
    main()
