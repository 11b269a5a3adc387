"""Spatially-sharded CA: halo-exchange windy step == single-device step.

Runs on the 8-device virtual CPU mesh (conftest).  Design-new vs the
reference (SURVEY.md §5: the reference never shards the lattice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.ops.windy import windy_step
from gymca_tpu.parallel.mesh import make_mesh
from gymca_tpu.parallel.spatial import windy_step_spatial

EMPTY, TREE, FIRE = 0, 3, 25


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_spatial_windy_matches_single_device(key, n_devices):
    mesh = make_mesh(n_devices)
    h, w = 64, 16
    grid = jax.random.choice(
        key, jnp.asarray([EMPTY, TREE, FIRE]), (h, w)
    ).astype(jnp.int32)
    wind = jnp.full((3, 3), 0.6).at[1, 1].set(0.0)
    k = jax.random.fold_in(key, 3)

    expected = windy_step(grid, wind, k, empty=EMPTY, tree=TREE, fire=FIRE)
    got = windy_step_spatial(
        grid, wind, k, mesh, empty=EMPTY, tree=TREE, fire=FIRE
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_spatial_windy_multiple_steps(key):
    """Fire propagates across shard boundaries over repeated sharded steps."""
    mesh = make_mesh(4)
    h, w = 32, 16
    grid = jnp.full((h, w), TREE, jnp.int32).at[0, 8].set(FIRE)
    wind = jnp.ones((3, 3)).at[1, 1].set(0.0)  # always propagate

    g_single = grid
    g_shard = grid
    for i in range(12):
        k = jax.random.fold_in(key, i)
        g_single = windy_step(g_single, wind, k, empty=EMPTY, tree=TREE,
                              fire=FIRE)
        g_shard = windy_step_spatial(g_shard, wind, k, mesh, empty=EMPTY,
                                     tree=TREE, fire=FIRE)
        np.testing.assert_array_equal(np.asarray(g_shard), np.asarray(g_single))
    # the fire front (1 row/step from row 0) must have crossed the first
    # shard boundary (row 8; shards are 8 rows on a 4-device mesh) by step 12
    assert (np.asarray(g_shard)[9:13] != TREE).any()


def test_grid_rows_not_divisible_raises(key):
    mesh = make_mesh(8)
    grid = jnp.zeros((30, 16), jnp.int32)
    with pytest.raises(AssertionError):
        windy_step_spatial(grid, jnp.zeros((3, 3)), key, mesh, empty=EMPTY,
                           tree=TREE, fire=FIRE)
