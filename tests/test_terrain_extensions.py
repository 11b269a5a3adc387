"""Terrain generation + extension-system tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gymca_tpu.envs import terrain
from gymca_tpu.envs.extensions import (
    EXTENSION_REGISTRY,
    apply_blur,
    apply_extensions,
    apply_visibility,
    extension_choices,
    transform_grid,
)


class TestTerrain:
    def test_vegetation_density_ranges(self, key):
        veg = terrain.init_vegetation(key, 24, 24, 3)
        den = terrain.init_density(jax.random.fold_in(key, 1), 24, 24, 3)
        for field in (veg, den):
            assert field.shape == (3, 24, 24)
            vals = np.unique(np.asarray(field))
            assert vals.min() >= 1 and vals.max() <= 5

    def test_altitude_positive_and_varied(self, key):
        alt = terrain.init_altitude(key, 24, 24, 2)
        assert alt.shape == (2, 24, 24)
        assert float(alt.min()) >= 0.0
        assert float(alt.std()) > 0.01  # hills/noise present

    def test_uniform_variants(self):
        assert bool(jnp.all(terrain.init_density_same(8, 8, 2) == 3))
        assert bool(jnp.all(terrain.init_vegetation_same(8, 8, 2) == 3))
        assert bool(jnp.all(terrain.init_altitude_same(8, 8, 2) == 0))

    def test_slope_tensor(self, key):
        alt = terrain.init_altitude(key, 12, 12, 1)
        slope = terrain.get_slope(alt)
        assert slope.shape == (1, 12, 12, 3, 3)
        s = np.asarray(slope[0])
        # center entry always zero; borders flat
        assert np.all(s[:, :, 1, 1] == 0)
        assert np.all(s[0] == 0) and np.all(s[-1] == 0)
        assert np.all(s[:, 0] == 0) and np.all(s[:, -1] == 0)
        # antisymmetry up to diagonal scaling: slope from a to b = -slope b to a
        a = np.asarray(alt[0])
        r, c = 5, 5
        expected = np.degrees(np.arctan(a[r, c] - a[r - 1, c]))
        assert abs(s[r, c, 0, 1] - expected) < 1e-4
        expected_diag = np.degrees(np.arctan((a[r, c] - a[r - 1, c - 1]) / 1.414))
        assert abs(s[r, c, 0, 0] - expected_diag) < 1e-4

    def test_winds(self):
        winds, fts = terrain.get_winds(True)
        assert winds.shape == (8, 3, 3) and fts.shape == (8, 3, 3)
        assert np.allclose(np.asarray(winds)[:, 1, 1], 0.0)  # center zeroed
        # Alexandridis formula at theta=0: exp(0.45)
        w, ft = terrain.calc_pw(0.0)
        assert abs(w - np.exp(0.45)) < 1e-9 and abs(ft - 1.0) < 1e-12

    def test_up_to_k_mappings(self):
        id_to_binary, binary_to_id = terrain.create_up_to_k_mappings(2, 1)
        expected = [(0, 0), (1, 0), (0, 1)]
        assert [tuple(r) for r in np.asarray(id_to_binary)] == expected
        assert binary_to_id[(0, 0)] == 0 and binary_to_id[(0, 1)] == 2
        # n=3, k=2: 1 + 3 + 3 = 7 ids
        m, _ = terrain.create_up_to_k_mappings(3, 2)
        assert m.shape == (7, 3)


class TestExtensions:
    def test_blur_obscures(self, key):
        grid = jax.random.randint(key, (16, 16), 0, 3)
        blurred = apply_blur(grid)
        assert blurred.shape == grid.shape
        assert not bool(jnp.array_equal(blurred, grid))  # actually changed
        # uniform grid is a blur fixed point
        uniform = jnp.full((8, 8), 2)
        assert bool(jnp.array_equal(apply_blur(uniform), uniform))

    def test_visibility_hides_value_3_by_day(self):
        grid = jnp.asarray([[3, 1], [2, 3]])
        day = apply_visibility(grid, jnp.asarray(0))
        night = apply_visibility(grid, jnp.asarray(1))
        assert bool(jnp.array_equal(day, jnp.asarray([[0, 1], [2, 0]])))
        assert bool(jnp.array_equal(night, grid))

    def test_transform_skips(self, key):
        grid = jax.random.randint(key, (8, 8), 0, 3)
        full = transform_grid(grid, jnp.asarray(0), 1, 1)  # skip both
        assert bool(jnp.array_equal(full, grid))

    def test_apply_extensions_gating(self, key):
        grid = jax.random.randint(key, (8, 8), 0, 3)
        is_night = jnp.asarray(0)
        # no bits set -> all channels zero
        chans = apply_extensions(grid, jnp.asarray([0, 0]), is_night, True)
        assert all(int(c.sum()) == 0 for c in chans)
        # unblur bit -> channel 0 equals the unblurred-but-visible grid
        chans = apply_extensions(grid, jnp.asarray([1, 0]), is_night, True)
        expected = transform_grid(grid, is_night, 0, 1)
        assert bool(jnp.array_equal(chans[0], expected))
        assert int(chans[1].sum()) == 0
        # disabled extensions -> zeros even with bits set
        chans = apply_extensions(grid, jnp.asarray([1, 1]), is_night, False)
        assert all(int(c.sum()) == 0 for c in chans)

    def test_registry_shape(self):
        assert extension_choices() == [(2, 1)]
        assert len(EXTENSION_REGISTRY[0].extensions) == 2
