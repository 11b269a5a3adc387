"""Deterministic sub-behavior tests for the fused Alexandridis kernel.

Runs under the Pallas TPU interpreter on CPU, where ``prng_random_bits`` is
a zero stub: uniforms are 0 (ignition fires iff p > 0) and sampled ages
collapse to ``fire_age_min`` — which makes every rule branch exactly
checkable against hand-computed expectations.  Stochastic equivalence with
the XLA path is validated on real TPU hardware (BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.ops.alexandridis import burn_kernel_layer_weights
from gymca_tpu.ops.pallas_alexandridis import alexandridis_fused_step
from gymca_tpu.ops.stencil import telescoped_box_coeffs

N, H, W = 1, 8, 128
EMPTY, TREE, FIRE = 0, 1, 2
KW = dict(
    empty=EMPTY, tree=TREE, fire=FIRE,
    layer_coeffs=telescoped_box_coeffs(burn_kernel_layer_weights(2)),
    dousing_border=0.01, dousing_inner=0.1,
    fire_age_min=48, fire_age_max=56, interpret=True,
)


def run(grid, age=None, dousing=None, vdf=2.0, wind=100.0):
    age = age if age is not None else jnp.where(grid == FIRE, 50.0, 0.0)
    dousing = dousing if dousing is not None else jnp.zeros_like(grid)
    return alexandridis_fused_step(
        grid, age, dousing,
        jnp.full((N, H, W), vdf),
        jnp.ones((N, 3, 3, H, W)),
        jnp.full((N, 8), wind),
        jnp.asarray([[3, 17]], jnp.int32),
        **KW,
    )


def test_certain_ignition_moore_neighbors():
    grid = jnp.ones((N, H, W), jnp.int32).at[0, 4, 60].set(FIRE)
    ng, na = run(grid)
    ng, na = np.asarray(ng), np.asarray(na)
    assert (ng[0] == FIRE).sum() == 9  # fire + 8 ignited neighbors
    new_fire = (ng[0] == FIRE) & (np.asarray(grid[0]) != FIRE)
    assert (na[0][new_fire] == KW["fire_age_min"]).all()
    assert na[0, 4, 60] == 49.0  # existing fire aged by 1


def test_no_fire_fixpoint():
    grid = jnp.ones((N, H, W), jnp.int32)
    ng, na = run(grid, age=jnp.zeros((N, H, W)))
    np.testing.assert_array_equal(np.asarray(ng), np.asarray(grid))
    np.testing.assert_array_equal(np.asarray(na), 0.0)


def test_dousing_blocks_ignition():
    grid = jnp.ones((N, H, W), jnp.int32).at[0, 4, 60].set(FIRE)
    ng, _ = run(grid, dousing=jnp.ones((N, H, W), jnp.int32))
    assert (np.asarray(ng)[0] == FIRE).sum() == 1  # nothing new ignites


def test_burnout_at_age_one():
    grid = jnp.ones((N, H, W), jnp.int32).at[0, 4, 60].set(FIRE)
    age = jnp.where(grid == FIRE, 1.0, 0.0)
    ng, _ = run(grid, age=age, dousing=jnp.ones((N, H, W), jnp.int32))
    assert np.asarray(ng)[0, 4, 60] == EMPTY


def test_zero_wind_no_spread():
    grid = jnp.ones((N, H, W), jnp.int32).at[0, 4, 60].set(FIRE)
    ng, _ = run(grid, wind=0.0)
    assert (np.asarray(ng)[0] == FIRE).sum() == 1


def test_empty_never_grows():
    grid = jnp.zeros((N, H, W), jnp.int32).at[0, 4, 60].set(FIRE)
    ng, _ = run(grid)
    assert (np.asarray(ng)[0] == TREE).sum() == 0


def test_env_pallas_flag_gating():
    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv

    # a supported config keeps the flag ON
    env = AdvancedForestFireBulldozerEnv(
        16, 128, key=jax.random.key(0), num_envs=2, use_pallas_ca=True
    )
    assert env.use_pallas_ca
    # non-tileable width falls back to the XLA path (with a warning)
    with pytest.warns(UserWarning, match="use_pallas_ca"):
        env = AdvancedForestFireBulldozerEnv(
            16, 16, key=jax.random.key(0), num_envs=2, use_pallas_ca=True
        )
    assert not env.use_pallas_ca
    with pytest.warns(UserWarning, match="use_pallas_ca"):
        env = AdvancedForestFireBulldozerEnv(
            16, 128, key=jax.random.key(0), num_envs=2, use_pallas_ca=True,
            ca_repeat_mode="modf",
        )
    assert not env.use_pallas_ca


def test_vmem_budget_gate():
    """512^2 exceeds the fused kernel's VMEM working set -> env must warn
    and fall back to the XLA CA path (ADVICE r1 / VERDICT r1 weak #2)."""
    from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv
    from gymca_tpu.ops.pallas_alexandridis import supports_fused_alexandridis

    assert supports_fused_alexandridis(256, 256)
    assert not supports_fused_alexandridis(512, 512)
    with pytest.warns(UserWarning, match="VMEM"):
        env = AdvancedForestFireBulldozerEnv(
            512, 512, key=jax.random.key(0), num_envs=1, use_pallas_ca=True
        )
    assert not env.use_pallas_ca
