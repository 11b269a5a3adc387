#!/usr/bin/env python
"""Phase attribution for the Advanced env step (VERDICT r3 weak #1).

Measures, with the same 1000-step-scan/min-of-reps harness as bench.py, the
cost of each phase of the 256²/64-env Advanced step so the flagship
steps/s number has a roofline story like the windy kernel's 281/189/175 µs
split.

Methodology (round-5 rewrite): the r4 version monkeypatched methods on a
LIVE env and re-jitted, which interacted badly with the env's jit caches
(it measured step-without-reset *slower* than step+reset).  This version
builds a FRESH env instance per variant and applies any stub *before the
instance's first trace*, so every timing is a clean first-class program:

  full         stateless_step + conditional_reset     (the bench-of-record)
  step_only    stateless_step alone                   (full - reset overhead)
  no_obs       fresh env whose RGB/extended obs epilogue is a zero stub
               (CA + move/dousing + day-night + reward/done only)
  no_ca        fresh env whose fused CA is an identity stub (everything
               EXCEPT the CA kernel)
  obs_iso      the vmapped obs build alone on fixed inputs (palette select +
               dousing tint + agent pixel); big tensors passed as jit ARGS
  ca_iso       the fused Alexandridis kernel alone (carry = grid + age)

Run on the real chip:  python scripts/exp_advanced_split.py --size 256 --envs 64
"""
from __future__ import annotations

# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def scan_time(step_fn, carry, steps, reps=3, consts=(), name=""):
    """Time ``step_fn(carry, consts, key) -> carry`` over a fused scan.

    ``consts`` are loop-invariant tensors passed as jit ARGUMENTS (closing
    over them would embed them in the HLO as constants — the tunneled
    remote-compile path rejects multi-MB payloads)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(carry, consts, key):
        def body(c, k):
            return step_fn(c, consts, k), ()

        c, _ = jax.lax.scan(body, carry, jax.random.split(key, steps))
        # Reduce the WHOLE carry to one f32 on device: the timing fence is a
        # 4-byte fetch.  device_get of a full carry leaf (12.6 MB of RGB at
        # 256²/64 envs) rides the single-chip tunnel at ~20 MB/s and adds
        # ~600 µs/step of pure transfer to every variant — it's what made
        # the r4/r5a numbers incoherent (step-only "slower" than full).
        return jax.tree.reduce(
            lambda a, x: a + jnp.sum(x).astype(jnp.float32),
            jax.tree.map(
                lambda x: x if jnp.issubdtype(x.dtype, jnp.number)
                else x.astype(jnp.int32),
                jax.tree.map(
                    lambda x: (jax.random.key_data(x)
                               if jnp.issubdtype(x.dtype, jax.dtypes.prng_key)
                               else x),
                    c,
                ),
            ),
            jnp.float32(0.0),
        )

    t0 = time.perf_counter()
    key = jax.random.key(1)
    _ = float(run(carry, consts, key))  # compile + first run
    print(f"[split] {name}: compile+first {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    _ = float(run(carry, consts, jax.random.fold_in(key, 1)))
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        _ = float(run(carry, consts, jax.random.fold_in(key, i + 2)))
        best = min(best, time.perf_counter() - t0)
    print(f"[split] {name}: {best/steps*1e6:.1f} us/step",
          file=sys.stderr, flush=True)
    return best / steps


def make_env(size, envs, *, obs_stub=False):
    import jax
    import jax.numpy as jnp

    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv

    env = AdvancedForestFireBulldozerEnv(
        size, size, key=jax.random.key(0), num_envs=envs
    )
    if obs_stub:
        def zero_build(grid, position, full_action, per_env, shared):
            rgb = jnp.zeros(grid.shape + (3,), env._obs_dtype)
            ext = jnp.zeros(grid.shape + (3 + 2,), jnp.float32)
            return rgb, ext

        # bound before the env's FIRST trace — no stale jit caches
        env.build_observation_on_extensions = zero_build
    return env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1000)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import gymca_tpu.ops.pallas_alexandridis as pax

    n = a.envs

    def acts(k):
        return jnp.stack(
            [jax.random.randint(k, (n,), 0, 9),
             jax.random.randint(jax.random.fold_in(k, 1), (n,), 0, 2),
             jnp.zeros((n,), jnp.int32)], axis=1)

    results = {}

    # --- full + step_only on the SAME pristine env ---------------------------
    env = make_env(a.size, a.envs)
    print(f"[split] size={a.size} envs={a.envs} "
          f"path={'fused-pallas' if env.use_pallas_ca else 'xla'} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    obs, info = env.reset()

    def full(carry, consts, k):
        obs, info = carry
        aa = acts(k)
        st = env.stateless_step(aa, obs, info)
        o2, _, _, _, i2 = env.conditional_reset(st, aa)
        return (o2, i2)

    def step_only(carry, consts, k):
        obs, info = carry
        o2, _, _, _, i2 = env.stateless_step(acts(k), obs, info)
        return (o2, i2)

    results["full_us"] = scan_time(full, (obs, info), a.steps, name="full")
    results["step_only_us"] = scan_time(step_only, (obs, info), a.steps, name="step_only")

    # --- obs epilogue stubbed out (fresh env, stub bound pre-trace) ----------
    env2 = make_env(a.size, a.envs, obs_stub=True)
    obs2, info2 = env2.reset()

    def step_noobs(carry, consts, k):
        obs, info = carry
        o2, _, _, _, i2 = env2.stateless_step(acts(k), obs, info)
        return (o2, i2)

    results["step_no_obs_us"] = scan_time(step_noobs, (obs2, info2), a.steps, name="step_no_obs")

    # --- CA stubbed out (fresh env, module attr patched pre-trace) -----------
    real_fused = pax.alexandridis_fused_step

    def identity_ca(grid, fire_age, dousing, vdf, exp_slope, wind_rows,
                    seeds, **kw):
        return grid.astype(jnp.int8), fire_age.astype(jnp.float32)

    pax.alexandridis_fused_step = identity_ca
    try:
        env3 = make_env(a.size, a.envs)
        obs3, info3 = env3.reset()

        def step_noca(carry, consts, k):
            obs, info = carry
            o2, _, _, _, i2 = env3.stateless_step(acts(k), obs, info)
            return (o2, i2)

        results["step_no_ca_us"] = scan_time(step_noca, (obs3, info3), a.steps, name="step_no_ca")
    finally:
        pax.alexandridis_fused_step = real_fused

    # --- obs epilogue isolated ------------------------------------------------
    pos = obs[1]["position"]

    def obs_iso(carry, consts, k):
        grid = carry
        dousing, is_night = consts
        fa = acts(k)
        rgb = jax.vmap(
            lambda g, p, aa, inight, dc: env._grid_to_rgb(
                g.astype(jnp.float32), inight, dc, p
            ),
            in_axes=(0, 0, 0, 0, 0),
        )(grid, pos, fa, is_night, dousing)
        # feed a data dependency forward so nothing DCEs
        return grid ^ (rgb[..., 0] > 200).astype(grid.dtype)

    results["obs_iso_us"] = scan_time(
        obs_iso, per_env["true_grid"],
        a.steps, consts=(per_env["dousing_count"], per_env["is_night"]), name="obs_iso",
    )

    # --- fused CA kernel isolated ----------------------------------------------
    if env.use_pallas_ca:
        from gymca_tpu.ops.stencil import NEIGHBOR_OFFSETS, telescoped_box_coeffs

        ca = env.ca
        wm = shared["winds"][per_env["wind_index"]]
        wind_rows = jnp.stack(
            [wm[:, 1 + dr, 1 + dc] for dr, dc in NEIGHBOR_OFFSETS], axis=-1
        )
        coeffs = telescoped_box_coeffs(ca.burn_layer_weights)

        def ca_iso(carry, consts, k):
            grid, age = carry
            dousing, vdf, slope, wind_rows = consts
            seeds = jax.random.key_data(
                jax.vmap(jax.random.fold_in, (None, 0))(k, jnp.arange(n))
            ).astype(jnp.int32)
            g2, a2 = real_fused(
                grid, age, dousing, vdf, slope, wind_rows, seeds,
                empty=env._empty, tree=env._tree, fire=env._fire,
                layer_coeffs=coeffs,
                dousing_border=float(ca._dousing_border),
                dousing_inner=float(ca._dousing_inner),
                fire_age_min=int(ca.fire_age_min),
                fire_age_max=int(ca.fire_age_max),
            )
            return g2.astype(grid.dtype), a2

        results["ca_iso_us"] = scan_time(
            ca_iso, (per_env["true_grid"], per_env["fire_age"]),
            a.steps, name="ca_iso",
            consts=(per_env["dousing_count"], per_env["veg_den_factor"],
                    per_env["exp_slope"], wind_rows),
        )

    us = lambda t: round(t * 1e6, 1)
    out = {"size": a.size, "envs": a.envs}
    out.update({k: us(v) for k, v in results.items()})
    out["reset_overhead_us"] = us(results["full_us"] - results["step_only_us"])
    out["obs_in_situ_us"] = us(results["step_only_us"]
                               - results["step_no_obs_us"])
    out["ca_in_situ_us"] = us(results["step_only_us"]
                              - results["step_no_ca_us"])
    out["steps_per_sec_full"] = round(a.envs / results["full_us"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
