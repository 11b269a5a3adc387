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
from jax import lax  # noqa: F401 — used throughout
from jax.sharding import Mesh, PartitionSpec as P

from gymca_tpu.ops.windy import windy_step_from_success

from gymca_tpu.parallel.sharded import shard_map

__all__ = [
    "windy_step_spatial",
    "alexandridis_step_spatial",
    "exchange_row_halos",
]


def exchange_row_halos(
    g_local: jnp.ndarray, axis: str, fill, n: int, radius: int = 1
) -> jnp.ndarray:
    """Return the local row band extended with ``radius``-row halos from the
    shards above and below (grid edges filled with ``fill``).

    ``g_local``: (H/D, W) shard inside a shard_map over mesh axis ``axis``
    of static size ``n``.  Output: (H/D + 2*radius, W).  Requires
    ``radius <= H/D`` (halos come from the immediate neighbors only).
    """
    assert radius <= g_local.shape[0], (radius, g_local.shape)
    idx = lax.axis_index(axis)

    down = [(j, (j + 1) % n) for j in range(n)]  # send toward higher idx
    up = [(j, (j - 1) % n) for j in range(n)]  # send toward lower idx

    # Rows above my band = last `radius` rows of shard idx-1; rows below =
    # first `radius` rows of shard idx+1.  Wraparound rows at the global
    # edges are replaced by fill.
    top_halo = lax.ppermute(g_local[-radius:], axis, down)
    bot_halo = lax.ppermute(g_local[:radius], axis, up)
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


def alexandridis_step_spatial(
    ca,
    grid: jnp.ndarray,
    per_env: dict,
    shared: dict,
    key,
    mesh: Mesh,
    *,
    axis: str = "data",
):
    """One Alexandridis CA update of a single huge (H, W) grid sharded into
    row bands over ``mesh[axis]`` — flagship-physics counterpart of
    :func:`windy_step_spatial`, design-new vs the reference (SURVEY.md §5).

    Each shard exchanges ``max(burn_kernel_radius, 2)``-row halos (the heat
    kernel's reach, floored at 2 so the radius-2 dousing box and radius-1
    ignition test are always covered even on tiny grids where
    ``burn_kernel_radius == 1``) via ``lax.ppermute``, runs the full XLA CA
    on its extended band, and keeps the interior rows.  Boundary-independent state (heat, dousing,
    terrain factors) is exact; per-cell randomness is drawn from
    shard-folded keys, so results are distributionally equivalent to the
    single-device step and *exactly* equal whenever the outcome is
    RNG-independent (certain/blocked ignition, burnout) — which is what the
    tests pin down.

    ``ca``: an :class:`~gymca_tpu.ops.alexandridis.AlexandridisCA`.
    ``per_env``: single-env context (fire_age, dousing_count, terrain...);
    H-axis leaves shard with the grid.  Returns (new_grid, new_fire_age).
    """
    n = mesh.shape[axis]
    h = grid.shape[0]
    r = max(ca.burn_kernel_radius, 2)  # dousing box reaches 2 rows across
    assert h % n == 0, f"grid rows {h} not divisible by mesh axis size {n}"
    assert r <= h // n, f"halo radius {r} exceeds band height {h // n}"

    # Partition the context: row-sharded (leading dim == h) vs replicated
    # scalars; exp_slope has its row axis at -2 and is handled separately.
    row_ctx = {
        k: v for k, v in per_env.items()
        if k not in ("exp_slope", "key")
        and hasattr(v, "ndim") and v.ndim >= 2 and v.shape[0] == h
    }
    scal_ctx = {
        k: v for k, v in per_env.items()
        if k not in row_ctx and k not in ("exp_slope", "key")
    }
    exp_slope = per_env["exp_slope"]  # (3, 3, H, W)

    def shard_fn(row_ctx, es_local, scal_ctx, shared, key):
        idx = lax.axis_index(axis)
        ctx_ext = {
            k: exchange_row_halos(
                v, axis, ca.empty if k == "true_grid" else 0, n, r
            )
            for k, v in row_ctx.items()
        }
        g_ext = ctx_ext.pop("true_grid")

        down = [(j, (j + 1) % n) for j in range(n)]
        up = [(j, (j - 1) % n) for j in range(n)]
        es_ext = jnp.concatenate(
            [
                jnp.where(idx == 0, 1.0,
                          lax.ppermute(es_local[..., -r:, :], axis, down)),
                es_local,
                jnp.where(idx == n - 1, 1.0,
                          lax.ppermute(es_local[..., :r, :], axis, up)),
            ],
            axis=-2,
        )

        pe = {**scal_ctx, **ctx_ext, "exp_slope": es_ext}
        shard_key = jax.random.fold_in(key, idx)
        new_ext, (new_pe, _) = ca.update(g_ext, None, (pe, shared), shard_key)
        # wind rotation diverges per shard — the caller owns global wind.
        return new_ext[r:-r], new_pe["fire_age"][r:-r]

    row_ctx["true_grid"] = grid
    stepped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            {k: P(axis) for k in row_ctx},
            P(None, None, axis, None),
            jax.tree.map(lambda _: P(), scal_ctx),
            jax.tree.map(lambda _: P(), shared),
            P(),
        ),
        out_specs=(P(axis, None), P(axis, None)),
    )
    return stepped(row_ctx, exp_slope, scal_ctx, shared, key)
