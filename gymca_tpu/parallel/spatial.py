"""Spatial grid sharding with halo exchange.

Design-new (no reference counterpart — the reference always keeps the full
H x W grid on one device, SURVEY.md §5): for grids too large for a single
chip, the lattice is split into row bands over a mesh axis and stepped with
``shard_map``.  Each CA update exchanges one-row halos with the neighboring
shards via ``lax.ppermute`` (nearest-neighbor traffic that rides the ICI
torus), then applies the same fused stencil locally — the collective volume
is O(W) per step vs O(H·W) compute, so scaling is essentially free until
bands get thin.

The gust roll is sampled once and replicated so every shard applies the same
global wind, keeping the result bit-identical to the single-device
:func:`gymca_tpu.ops.windy.windy_step`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gymca_tpu.ops.windy import windy_step_from_success

from gymca_tpu.parallel.sharded import shard_map

__all__ = ["windy_step_spatial", "exchange_row_halos"]


def exchange_row_halos(
    g_local: jnp.ndarray, axis: str, fill, n: int
) -> jnp.ndarray:
    """Return the local row band extended with 1-row halos from the shards
    above and below (grid edges filled with ``fill``).

    ``g_local``: (H/D, W) shard inside a shard_map over mesh axis ``axis``
    of static size ``n``.  Output: (H/D + 2, W).
    """
    idx = lax.axis_index(axis)

    down = [(j, (j + 1) % n) for j in range(n)]  # send toward higher idx
    up = [(j, (j - 1) % n) for j in range(n)]  # send toward lower idx

    # Row above my band = last row of shard idx-1; row below = first row of
    # shard idx+1.  Wraparound rows at the global edges are replaced by fill.
    top_halo = lax.ppermute(g_local[-1:], axis, down)
    bot_halo = lax.ppermute(g_local[:1], axis, up)
    top_halo = jnp.where(idx == 0, fill, top_halo)
    bot_halo = jnp.where(idx == n - 1, fill, bot_halo)
    return jnp.concatenate([top_halo, g_local, bot_halo], axis=0)


def windy_step_spatial(
    grid: jnp.ndarray,
    wind: jnp.ndarray,
    key,
    mesh: Mesh,
    *,
    empty: int,
    tree: int,
    fire: int,
    axis: str = "data",
):
    """One windy-CA update of a single huge (H, W) grid sharded into row
    bands over ``mesh[axis]``.  Bit-identical to the single-device
    ``windy_step`` under the same key.

    H must be divisible by the mesh axis size.
    """
    n = mesh.shape[axis]
    h = grid.shape[0]
    assert h % n == 0, f"grid rows {h} not divisible by mesh axis size {n}"

    roll = jax.random.uniform(key, (3, 3), dtype=jnp.float32)
    success = wind > roll  # replicated: same global gust on every shard

    def shard_fn(g_local, success):
        g_ext = exchange_row_halos(g_local, axis, empty, n)
        new_ext = windy_step_from_success(
            g_ext, success, empty=empty, tree=tree, fire=fire
        )
        return new_ext[1:-1]

    stepped = shard_map(
        partial(shard_fn),
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=P(axis, None),
    )
    return stepped(grid, success)
