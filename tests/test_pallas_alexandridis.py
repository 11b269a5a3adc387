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
    """Single-program kernel tops out ~320^2; the ROW-BAND TILED kernel
    (r4) extends coverage through 512^2 and 1024^2, and the r5 int8 band/
    cumsum matrices (half the VMEM of bf16) admit 2048^2 (band 16).  The
    remaining ceiling is the (W, W) triangular cumsum matrix: 4096^2 falls
    back to the XLA path."""
    from gymca_tpu.ops.pallas_alexandridis import (
        _fits_single_program,
        _radius_for,
        _tiled_band_rows,
        supports_fused_alexandridis,
    )

    assert supports_fused_alexandridis(256, 256)
    assert _fits_single_program(256, 256, _radius_for(256))
    # 512^2 / 1024^2: single-program does NOT fit, tiling does
    for n in (512, 1024):
        r = _radius_for(n)
        assert not _fits_single_program(n, n, r), n
        assert _tiled_band_rows(n, n, r) is not None, n
        assert supports_fused_alexandridis(n, n), n
    assert supports_fused_alexandridis(2048, 2048)
    assert not supports_fused_alexandridis(4096, 4096)
    assert not supports_fused_alexandridis(256, 200)  # width not tileable


def test_tiled_matches_single_program_across_band_halos():
    """The row-band tiled kernel must reproduce the single-program kernel
    EXACTLY under the deterministic interpreter (PRNG stub = 0), including
    fire spreading across band boundaries through the assembled halos.
    tile_band_rows=8 forces 4 bands on a 32-row grid; fires sit ON the
    band seams (rows 7/8, 15/16, 23/24) and at global edges."""
    N, H, W = 2, 32, 128
    key = jax.random.key(3)
    grid = jax.random.choice(
        key, jnp.asarray([EMPTY, TREE, TREE, FIRE]), (N, H, W)
    ).astype(jnp.int32)
    for r, c in [(7, 64), (8, 70), (15, 5), (16, 9), (23, 100), (24, 101),
                 (0, 0), (31, 127)]:
        grid = grid.at[0, r, c].set(FIRE)
    age = jnp.where(grid == FIRE, 50.0, 0.0)
    dousing = (
        jax.random.uniform(jax.random.fold_in(key, 1), (N, H, W)) < 0.1
    ).astype(jnp.int32)
    args = (
        grid, age, dousing,
        jnp.full((N, H, W), 2.0),
        jnp.ones((N, 3, 3, H, W)),
        jnp.full((N, 8), 100.0),
        jnp.asarray([[3, 17], [5, 23]], jnp.int32),
    )
    g1, a1 = alexandridis_fused_step(*args, **KW)
    g2, a2 = alexandridis_fused_step(
        *args, force_tiled=True, tile_band_rows=8, **KW
    )
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_sat_matches_banded_box_path():
    """The summed-area-table box path (round 5: 4 matmuls/env) must be
    BIT-identical to the per-radius banded-matmul path — the counts are
    exact integers on both, and the PRNG draw order is unchanged.  Fires
    placed on every edge/corner exercise the SAT's clamped-corner logic."""
    N2, H2, W2 = 2, 16, 128
    key = jax.random.key(11)
    grid = jax.random.choice(
        key, jnp.asarray([EMPTY, TREE, TREE, FIRE]), (N2, H2, W2)
    ).astype(jnp.int32)
    for r, c in [(0, 0), (0, 127), (15, 0), (15, 127), (7, 64)]:
        grid = grid.at[0, r, c].set(FIRE)
    age = jnp.where(grid == FIRE, 50.0, 0.0)
    dousing = (
        jax.random.uniform(jax.random.fold_in(key, 1), (N2, H2, W2)) < 0.1
    ).astype(jnp.int32)
    args = (
        grid, age, dousing,
        jnp.full((N2, H2, W2), 2.0),
        jnp.ones((N2, 3, 3, H2, W2)),
        jnp.full((N2, 8), 100.0),
        jnp.asarray([[3, 17], [5, 23]], jnp.int32),
    )
    g1, a1 = alexandridis_fused_step(*args, box_mode="banded", **KW)
    g2, a2 = alexandridis_fused_step(*args, box_mode="sat", **KW)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # int8 MXU path (round 5, the default): exact integer counts, same PRNG
    # draw order => bit-identical too
    g3, a3 = alexandridis_fused_step(*args, box_mode="banded8", **KW)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g3))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a3))


def test_box_mode_validated():
    """Unknown box_mode raises instead of silently falling through to the
    bf16 banded branch (r5)."""
    import pytest as _pytest

    from gymca_tpu.ops.pallas_alexandridis import alexandridis_fused_step

    with _pytest.raises(ValueError, match="box_mode"):
        alexandridis_fused_step(
            jnp.zeros((1, 8, 128), jnp.int8),
            jnp.zeros((1, 8, 128), jnp.float32),
            jnp.zeros((1, 8, 128), jnp.int8),
            jnp.ones((1, 8, 128), jnp.float32),
            jnp.ones((1, 3, 3, 8, 128), jnp.float32),
            jnp.ones((1, 8), jnp.float32),
            jnp.zeros((1, 2), jnp.int32),
            empty=0, tree=1, fire=2,
            layer_coeffs=(1.0, 0.5),
            dousing_border=0.1, dousing_inner=0.2,
            fire_age_min=3, fire_age_max=7,
            interpret=True, box_mode="band8",
        )
