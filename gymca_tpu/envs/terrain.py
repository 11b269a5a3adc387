"""Terrain generation for the Advanced Bulldozer environment — vectorized.

Counterpart of reference ``bulldozer/utils/init_utils.py``:

* vegetation / density: random rectangular patches of type 1..5, leftover
  cells filled with 1..3 (``init_utils.py:10-73``);
* altitude: uniform noise + cosine hills + linear slopes, /10
  (``init_utils.py:76-116``);
* per-cell 3x3 slope tensor ``degrees(atan(dalt))`` with diagonals /1.414,
  flat borders, zero center (``init_utils.py:166-200``);
* 8 directional 3x3 wind matrices from the Alexandridis formula
  ``exp(c1*V) * exp(V*c2*(cos(theta)-1))``, V=10, c1=0.045, c2=0.131
  (``init_utils.py:203-245``);
* ``create_up_to_k_mappings`` for extension-combination action ids
  (``init_utils.py:119-143``).

TPU-first: the reference builds terrain with Python loops over cells and the
*global* NumPy RNG at ``__init__`` time.  Here everything is key-driven,
jit-able JAX (masked fori over a static max patch/hill count), so terrain can
be resampled *inside* a compiled reset.  Known reference quirk reproduced:
``get_winds(use_hidden)``'s non-hidden branch is dead code — the loop
re-iterates all 8 wind_thetas regardless (``init_utils.py:233-239``).
"""

from __future__ import annotations

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np

from gymca_tpu.config import TYPE_BOX, TYPE_INT

__all__ = [
    "init_vegetation",
    "init_density",
    "init_altitude",
    "init_vegetation_same",
    "init_density_same",
    "init_altitude_same",
    "get_slope",
    "get_winds",
    "calc_pw",
    "create_up_to_k_mappings",
    "WIND_THETAS",
]

MAX_PATCHES = 7  # reference: randint(4, 8) patches
MAX_HILLS = 9  # reference: randint(6, 10) hills
MAX_SLOPES = 7  # reference: randint(4, 8) slopes


def _patch_field(key, nrows: int, ncols: int) -> jnp.ndarray:
    """One env's patch map: sequential random rectangles of type 1..5, zeros
    backfilled with 1..3 (init_utils.py:14-38)."""
    k_n, k_fill, *patch_keys = jax.random.split(key, 2 + MAX_PATCHES)
    num_patches = jax.random.randint(k_n, (), 4, 8)

    rows = jnp.arange(nrows)[:, None]
    cols = jnp.arange(ncols)[None, :]
    field = jnp.zeros((nrows, ncols), TYPE_INT)

    def apply_patch(i, field):
        kc = jax.random.fold_in(patch_keys[0], i)
        k1, k2, k3, k4, k5 = jax.random.split(kc, 5)
        center_row = jax.random.randint(k1, (), 0, nrows)
        center_col = jax.random.randint(k2, (), 0, ncols)
        patch_h = jax.random.randint(k3, (), 3, max(nrows // 2, 4))
        patch_w = jax.random.randint(k4, (), 3, max(ncols // 2, 4))
        ptype = jax.random.randint(k5, (), 1, 6)

        inside = (
            (rows >= center_row - patch_h // 2)
            & (rows < center_row + patch_h // 2)
            & (cols >= center_col - patch_w // 2)
            & (cols < center_col + patch_w // 2)
        )
        active = i < num_patches
        return jnp.where(active & inside, ptype, field)

    field = jax.lax.fori_loop(0, MAX_PATCHES, apply_patch, field)
    filler = jax.random.randint(k_fill, (nrows, ncols), 1, 4)
    return jnp.where(field == 0, filler, field).astype(TYPE_INT)


def init_vegetation(key, nrows: int, ncols: int, num_envs: int) -> jnp.ndarray:
    keys = jax.random.split(key, num_envs)
    return jax.vmap(lambda k: _patch_field(k, nrows, ncols))(keys)


def init_density(key, nrows: int, ncols: int, num_envs: int) -> jnp.ndarray:
    keys = jax.random.split(key, num_envs)
    return jax.vmap(lambda k: _patch_field(k, nrows, ncols))(keys)


def _altitude_field(key, nrows: int, ncols: int) -> jnp.ndarray:
    """One env's altitude: noise + cosine hills + linear slopes, /10
    (init_utils.py:76-116)."""
    k_base, k_nh, k_hills, k_ns, k_slopes = jax.random.split(key, 5)
    alt = jax.random.uniform(k_base, (nrows, ncols), minval=0.0, maxval=5.0)

    rows = jnp.arange(nrows)[:, None].astype(jnp.float32)
    cols = jnp.arange(ncols)[None, :].astype(jnp.float32)

    num_hills = jax.random.randint(k_nh, (), 6, 10)
    max_radius = max(min(nrows, ncols) // 4, 3)

    def add_hill(i, alt):
        kc = jax.random.fold_in(k_hills, i)
        k1, k2, k3, k4 = jax.random.split(kc, 4)
        cr = jax.random.randint(k1, (), 0, nrows).astype(jnp.float32)
        cc = jax.random.randint(k2, (), 0, ncols).astype(jnp.float32)
        radius = jax.random.randint(k3, (), 2, max_radius).astype(jnp.float32)
        height = jax.random.uniform(k4, (), minval=2.0, maxval=6.0)
        dist = jnp.sqrt((rows - cr) ** 2 + (cols - cc) ** 2)
        factor = jnp.cos(dist / radius * jnp.pi / 2)
        bump = jnp.where(dist < radius, height * factor, 0.0)
        active = i < num_hills
        return alt + jnp.where(active, bump, 0.0)

    alt = jax.lax.fori_loop(0, MAX_HILLS, add_hill, alt)

    num_slopes = jax.random.randint(k_ns, (), 4, 8)

    def add_slope(i, alt):
        kc = jax.random.fold_in(k_slopes, i)
        k1, k2, k3, k4, k5 = jax.random.split(kc, 5)
        start_row = jax.random.randint(k1, (), 0, max(nrows - 4, 1))
        start_col = jax.random.randint(k2, (), 0, max(ncols - 4, 1))
        width = jax.random.randint(k3, (), 3, max(ncols // 4, 4))
        height = jax.random.randint(k4, (), 3, max(nrows // 4, 4))
        height_diff = jax.random.uniform(k5, (), minval=1.0, maxval=4.0)
        inside = (
            (rows >= start_row)
            & (rows < start_row + height)
            & (cols >= start_col)
            & (cols < start_col + width)
        )
        progress = (rows - start_row) / jnp.maximum(height.astype(jnp.float32), 1.0)
        ramp = jnp.where(inside, height_diff * progress, 0.0)
        active = i < num_slopes
        return alt + jnp.where(active, ramp, 0.0)

    alt = jax.lax.fori_loop(0, MAX_SLOPES, add_slope, alt)
    return (alt / 10.0).astype(TYPE_BOX)


def init_altitude(key, nrows: int, ncols: int, num_envs: int) -> jnp.ndarray:
    keys = jax.random.split(key, num_envs)
    return jax.vmap(lambda k: _altitude_field(k, nrows, ncols))(keys)


# Uniform (non-hidden) variants (init_utils.py:147-159)
def init_density_same(nrows, ncols, num_envs):
    return jnp.full((num_envs, nrows, ncols), 3, TYPE_INT)


def init_vegetation_same(nrows, ncols, num_envs):
    return jnp.full((num_envs, nrows, ncols), 3, TYPE_INT)


def init_altitude_same(nrows, ncols, num_envs):
    return jnp.zeros((num_envs, nrows, ncols), TYPE_BOX)


def get_slope(altitude: jnp.ndarray) -> jnp.ndarray:
    """Per-cell 3x3 slope tensor from altitude (..., H, W) ->
    (..., H, W, 3, 3).

    ``slope[..., r, c, i, j] = degrees(atan((alt[r,c] - alt[r+i-1, c+j-1]) /
    (1.414 if diagonal)))``; border cells stay all-zero and the center entry
    is 0 (init_utils.py:166-200), computed with shifted views instead of the
    reference's per-cell Python loop.
    """
    h, w = altitude.shape[-2:]
    out = []
    for di in (-1, 0, 1):
        row_entries = []
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                row_entries.append(jnp.zeros_like(altitude))
                continue
            pad = [(0, 0)] * (altitude.ndim - 2) + [(1, 1), (1, 1)]
            padded = jnp.pad(altitude, pad, mode="edge")
            neigh = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(padded, 1 + di, 1 + di + h, axis=-2),
                1 + dj,
                1 + dj + w,
                axis=-1,
            )
            diff = altitude - neigh
            if di != 0 and dj != 0:
                diff = diff / 1.414
            row_entries.append(jnp.degrees(jnp.arctan(diff)))
        out.append(jnp.stack(row_entries, axis=-1))
    slope = jnp.stack(out, axis=-2)  # (..., H, W, 3, 3)

    # Borders remain flat (reference loops range(1, n-1)).
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    interior = (
        ((rows > 0) & (rows < h - 1))[:, None]
        & ((cols > 0) & (cols < w - 1))[None, :]
    )
    return jnp.where(interior[..., None, None], slope, 0.0).astype(TYPE_BOX)


# 8 directional theta tables (init_utils.py:203-220); theta = angle between
# wind direction and fire-propagation direction.
WIND_THETAS = np.array(
    [
        [[45, 0, 45], [90, 0, 90], [135, 180, 135]],  # North
        [[90, 45, 0], [135, 0, 45], [180, 135, 90]],  # Northeast
        [[135, 90, 45], [180, 0, 0], [135, 90, 45]],  # East
        [[180, 135, 90], [135, 0, 45], [90, 45, 0]],  # Southeast
        [[135, 180, 135], [90, 0, 90], [45, 0, 45]],  # South
        [[90, 135, 180], [45, 0, 135], [0, 45, 90]],  # Southwest
        [[45, 90, 135], [0, 0, 180], [45, 90, 135]],  # West
        [[0, 45, 90], [45, 0, 135], [90, 135, 180]],  # Northwest
    ],
    dtype=np.float64,
)


def calc_pw(theta):
    """Alexandridis wind factor (init_utils.py:225-230)."""
    c_1, c_2 = 0.045, 0.131
    V = 10
    t = np.radians(theta)
    ft = np.exp(V * c_2 * (np.cos(t) - 1))
    return np.exp(c_1 * V) * ft, ft


def get_winds(use_hidden: bool = True):
    """8 (wind_matrix, ft) pairs.  NOTE: reproduces the reference quirk where
    the ``use_hidden=False`` branch is dead (init_utils.py:233-239) — all 8
    directional matrices are returned regardless."""
    wind_matrices = []
    fts = []
    for thetas in WIND_THETAS:
        wind_matrix, ft = calc_pw(np.asarray(thetas))
        wind_matrix[1, 1] = 0.0
        wind_matrices.append(wind_matrix)
        fts.append(ft)
    return (
        jnp.asarray(np.stack(wind_matrices), TYPE_BOX),
        jnp.asarray(np.stack(fts), TYPE_BOX),
    )


def create_up_to_k_mappings(n: int, k: int):
    """Mappings between combination ids and binary selection vectors
    (init_utils.py:119-143)."""
    binary_vectors = []
    binary_to_id = {}
    current_id = 0
    for i in range(k + 1):
        for combo in itertools.combinations(range(n), i):
            binary = [0] * n
            for idx in combo:
                binary[idx] = 1
            binary = tuple(binary)
            binary_vectors.append(binary)
            binary_to_id[binary] = current_id
            current_id += 1
    return jnp.asarray(binary_vectors, TYPE_INT), binary_to_id
