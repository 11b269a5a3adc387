#!/usr/bin/env python
"""Real-TPU distributional validation of the fused Pallas Alexandridis CA.

The CPU test suite can only exercise the fused kernel's DETERMINISTIC
sub-behaviors (the TPU interpreter stubs ``prng_random_bits`` to zero), so
the stochastic sampling path — in-kernel per-cell uniforms vs the XLA
path's ``jax.random`` — is validated here on hardware: step the SAME
initial 64-env 256² population through both paths and compare fire-spread
statistics (mean/std of per-env fire counts and burned cells at
checkpoints).  The two paths draw from different PRNGs by design
(performance mode), so the claim is DISTRIBUTIONAL equivalence, not
bit-identity; tolerances are set by the cross-env sampling noise at 64
envs.

Exit code 0 + "PASS" lines on success.  Record output in docs/STATUS.md.
"""

from __future__ import annotations

# allow running as `python scripts/<name>.py` without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv

# overridable: validate_fused_ca_tpu.py [SIZE] [N_ENVS] [STEPS]
SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 500
CHECKPOINTS = tuple(t for t in (100, 200, 300, 400, 500) if t <= STEPS)


def rollout_fire_stats(use_pallas: bool):
    env = AdvancedForestFireBulldozerEnv(
        SIZE, SIZE, key=jax.random.key(0), num_envs=N_ENVS,
        use_pallas_ca=use_pallas,
    )
    assert env.use_pallas_ca == use_pallas, "pallas gate mismatch"
    obs, info = env.reset()

    @jax.jit
    def run(obs, info):
        def body(carry, _):
            obs, info = carry
            acts = jnp.zeros((N_ENVS, 3), jnp.int32).at[:, 0].set(4)  # stay
            step_tuple = env.stateless_step(acts, obs, info)
            obs2, _, _, _, info2 = env.conditional_reset(step_tuple, acts)
            grid = obs2[1]["per_env_context"]["true_grid"]
            fires = jnp.sum(grid == 2, axis=(1, 2))
            empties = jnp.sum(grid == 0, axis=(1, 2))
            return (obs2, info2), (fires, empties)

        (obs, info), (fires, empties) = jax.lax.scan(
            body, (obs, info), None, length=STEPS
        )
        return fires, empties  # (STEPS, N_ENVS)

    fires, empties = run(obs, info)
    return np.asarray(fires), np.asarray(empties)


def main():
    if jax.default_backend() == "cpu":
        print("needs a real TPU (interpret-mode PRNG is a zero stub)")
        sys.exit(2)

    f_x, e_x = rollout_fire_stats(use_pallas=False)
    f_p, e_p = rollout_fire_stats(use_pallas=True)

    ok = True
    print(f"fused-CA distributional validation: {N_ENVS} envs, {SIZE}^2, "
          f"{STEPS} steps, backend={jax.default_backend()}")
    for t in CHECKPOINTS:
        mx, mp = f_x[t - 1].mean(), f_p[t - 1].mean()
        sx = f_x[t - 1].std() / np.sqrt(N_ENVS)
        sp = f_p[t - 1].std() / np.sqrt(N_ENVS)
        # 4-sigma band on the difference of means (cross-env noise)
        band = 4.0 * float(np.hypot(sx, sp))
        diff = abs(float(mx - mp))
        verdict = "PASS" if diff <= max(band, 0.05 * max(mx, mp, 1.0)) else "FAIL"
        ok &= verdict == "PASS"
        print(f"  t={t:4d}: fire mean xla={mx:9.1f} pallas={mp:9.1f} "
              f"|diff|={diff:7.1f} band={band:7.1f} -> {verdict}")
        bx, bp = e_x[t - 1].mean(), e_p[t - 1].mean()
        sbx = e_x[t - 1].std() / np.sqrt(N_ENVS)
        sbp = e_p[t - 1].std() / np.sqrt(N_ENVS)
        bandb = 4.0 * float(np.hypot(sbx, sbp))
        diffb = abs(float(bx - bp))
        verdictb = (
            "PASS" if diffb <= max(bandb, 0.05 * max(bx, bp, 1.0)) else "FAIL"
        )
        ok &= verdictb == "PASS"
        print(f"          burned mean xla={bx:9.1f} pallas={bp:9.1f} "
              f"|diff|={diffb:7.1f} band={bandb:7.1f} -> {verdictb}")

    print("OVERALL:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
