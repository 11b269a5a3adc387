"""Spatially-sharded Alexandridis CA vs single-device (virtual CPU mesh).

Per-cell randomness is shard-keyed, so parity is asserted on
RNG-independent outcomes: certain ignition (p >= 1), blocked ignition
(dousing / zero wind), burnout timing, no-fire fixpoint — these must match
the single-device CA *exactly*, including across shard boundaries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.ops.alexandridis import AlexandridisCA
from gymca_tpu.parallel.mesh import make_mesh
from gymca_tpu.parallel.spatial import alexandridis_step_spatial

H, W = 32, 16
EMPTY, TREE, FIRE = 0, 1, 2


@pytest.fixture(scope="module")
def ca():
    return AlexandridisCA(H, EMPTY, TREE, FIRE, static_p_tree=0.0)


def make_ctx(ca, grid, wind_scale):
    h, w = grid.shape
    winds = jnp.full((8, 3, 3), wind_scale)
    shared = {
        "winds": winds,
        "fts": jnp.ones((8, 3, 3)),
        "p_fire": jnp.asarray(0.0),
        "p_tree": jnp.asarray(0.0),
        "p_wind_change": jnp.asarray(0.0),  # keep wind stable
        "day_length": 400,
    }
    per_env = {
        "wind_index": jnp.asarray(0),
        "density": jnp.full((h, w), 3, jnp.int32),
        "vegetation": jnp.full((h, w), 3, jnp.int32),
        "altitude": jnp.zeros((h, w)),
        "slope": jnp.zeros((h, w, 3, 3)),
        "exp_slope": jnp.ones((3, 3, h, w)),
        "veg_den_factor": jnp.full((h, w), 2.0),
        "fire_age": jnp.where(grid == FIRE, 50.0, 0.0),
        "dousing_count": jnp.zeros((h, w), jnp.int32),
        "is_night": jnp.asarray(0),
        "true_grid": grid,
        "time_step": jnp.asarray(1),
        "key": jax.random.key(0),
    }
    return per_env, shared


def run_both(ca, grid, wind_scale, n_devices, key, per_env_mod=None):
    per_env, shared = make_ctx(ca, grid, wind_scale)
    if per_env_mod:
        per_env.update(per_env_mod)
    single_grid, (single_pe, _) = ca.update(
        grid, None, (dict(per_env), shared), key
    )
    mesh = make_mesh(n_devices)
    shard_grid, shard_age = alexandridis_step_spatial(
        ca, grid, per_env, shared, key, mesh
    )
    return (np.asarray(single_grid), np.asarray(single_pe["fire_age"]),
            np.asarray(shard_grid), np.asarray(shard_age))


@pytest.mark.parametrize("n_devices", [2, 4])
def test_certain_ignition_across_boundaries(ca, key, n_devices):
    """Fire sits ON the shard boundary row; huge wind makes ignition
    certain, so the sharded and single-device grids must match exactly."""
    band = H // n_devices
    grid = jnp.full((H, W), TREE, jnp.int32).at[band, 8].set(FIRE)
    sg, sa, gg, ga = run_both(ca, grid, 1e6, n_devices, key)
    np.testing.assert_array_equal(gg, sg)
    # both neighbors of the boundary row ignited
    assert (gg[band - 1 : band + 2, 7:10] == FIRE).sum() == 9


@pytest.mark.parametrize("n_devices", [2, 4])
def test_zero_wind_fixpoint(ca, key, n_devices):
    grid = jnp.full((H, W), TREE, jnp.int32).at[5, 8].set(FIRE)
    sg, sa, gg, ga = run_both(ca, grid, 0.0, n_devices, key)
    np.testing.assert_array_equal(gg, sg)
    np.testing.assert_array_equal(ga, sa)  # no new fires -> ages exact


def test_burnout_exact(ca, key):
    grid = jnp.full((H, W), TREE, jnp.int32).at[15, 8].set(FIRE)
    sg, sa, gg, ga = run_both(
        ca, grid, 0.0, 4, key,
        per_env_mod={"fire_age": jnp.where(grid == FIRE, 1.0, 0.0)},
    )
    assert gg[15, 8] == EMPTY
    np.testing.assert_array_equal(gg, sg)


def test_dousing_everywhere_blocks(ca, key):
    grid = jnp.full((H, W), TREE, jnp.int32).at[H // 4, 8].set(FIRE)
    sg, _, gg, _ = run_both(
        ca, grid, 1.0, 4, key,
        per_env_mod={"dousing_count": jnp.ones((H, W), jnp.int32)},
    )
    assert (gg == FIRE).sum() == 1
    np.testing.assert_array_equal(gg, sg)


def test_dousing_blocks_across_boundary(ca, key):
    """Retardant lives ONLY in shard 0's last two rows; the fire sits in
    shard 1.  The radius-2 dousing box must reach across the shard boundary
    and block ignition on shard 1's side too (otherwise a halo narrower than
    the dousing reach would let boundary cells ignite)."""
    band = H // 4  # first row of shard 1
    grid = jnp.full((H, W), TREE, jnp.int32).at[band, 8].set(FIRE)
    dousing = jnp.zeros((H, W), jnp.int32).at[band - 2 : band, :].set(1)
    # Huge wind -> every undoused neighbor ignites certainly; the dousing
    # box (radius 2) covers rows band-4..band+1, i.e. every radius-1
    # neighbor of the fire, so nothing may ignite — an RNG-independent
    # outcome that must match the single-device CA exactly.
    sg, _, gg, _ = run_both(
        ca, grid, 1e6, 4, key, per_env_mod={"dousing_count": dousing}
    )
    assert (gg == FIRE).sum() == 1, "cross-boundary dousing must block"
    np.testing.assert_array_equal(gg, sg)


def test_dousing_halo_floor_on_tiny_grid(key):
    """grid_size 8 has burn_kernel_radius == 1, narrower than the radius-2
    dousing box — the spatial path must still floor the halo at 2 rows so
    cross-shard retardant is seen (ADVICE r1 finding)."""
    ca8 = AlexandridisCA(8, EMPTY, TREE, FIRE, static_p_tree=0.0)
    assert ca8.burn_kernel_radius == 1
    grid = jnp.full((8, 8), TREE, jnp.int32).at[4, 4].set(FIRE)  # shard 1 row 0
    # Retardant ONLY in row 2 — exactly two rows above the boundary, so a
    # radius-1 halo would not see it.  It reaches the fire's row-4 neighbors
    # via the radius-2 dousing box (blocking them) but not row 5 (ignites).
    dousing = jnp.zeros((8, 8), jnp.int32).at[2, :].set(1)
    per_env, shared = make_ctx(ca8, grid, 1e6)
    per_env["dousing_count"] = dousing
    single_grid, _ = ca8.update(grid, None, (dict(per_env), shared), key)
    single = np.asarray(single_grid)
    assert single[4, 3] == TREE and single[4, 5] == TREE, "row-2 dousing blocks row 4"
    assert (single[5, 3:6] == FIRE).all(), "row 5 is out of dousing reach"
    mesh = make_mesh(2)
    shard_grid, _ = alexandridis_step_spatial(ca8, grid, per_env, shared, key, mesh)
    np.testing.assert_array_equal(np.asarray(shard_grid), single)
