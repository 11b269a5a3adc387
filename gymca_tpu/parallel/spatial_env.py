"""END-TO-END env steps on spatially-sharded grids.

Design-new vs the reference (which never scales the grid axis at all —
SURVEY.md §2.10/§5): for lattices too large for one chip the grid is split
into row bands over a mesh axis and the WHOLE env step — CA update with
``lax.ppermute`` halo exchange, the agent's Move/Modify (whose cell write
lands on exactly one shard), and reward/termination from ``psum``-reduced
shard-local cell counts — runs as one ``shard_map`` program.  The gust roll
and all scalar context stay replicated (caller-owned global wind), so the
result is bit-identical to the single-device ``BulldozerCore.step`` under
the same key; ``tests/test_spatial_env.py`` pins that.

The Alexandridis flagship physics gets the same treatment in
:func:`advanced_step_spatial`: the sharded CA core reuses
:func:`~gymca_tpu.parallel.spatial.alexandridis_step_spatial`'s halo logic,
and the env epilogue (dousing write, fire-count reward, day/night clock)
runs as sharded array ops that XLA's SPMD partitioner places automatically.
The step is headless (no RGB observation): at the grid scales that need
spatial sharding, a full-grid RGB render per step is the wrong interface —
callers pull rendered frames explicitly when needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gymca_tpu.config import TYPE_BOX, TYPE_INT
from gymca_tpu.core.env import EnvState, StepOutput
from gymca_tpu.envs.bulldozer import BulldozerCore, derive_step_key
from gymca_tpu.ops.move_modify import move_position
from gymca_tpu.ops.windy import windy_step_from_success
from gymca_tpu.parallel.sharded import shard_map
from gymca_tpu.parallel.spatial import exchange_row_halos

__all__ = ["bulldozer_step_spatial", "shard_state", "advanced_step_spatial"]


def shard_state(state: EnvState, mesh: Mesh, axis: str = "data") -> EnvState:
    """Place a single-env state's (H, W) grid in row bands over ``mesh``;
    everything else replicates."""
    grid_sh = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(
            x,
            grid_sh
            if hasattr(x, "ndim") and x.ndim == 2 and x.shape[0] % mesh.shape[axis] == 0
            else repl,
        ),
        state,
    )


def bulldozer_step_spatial(
    core: BulldozerCore, state: EnvState, action, mesh: Mesh, *,
    axis: str = "data",
):
    """One full Bulldozer env step on ONE huge row-sharded grid.

    Mirrors ``BulldozerCore.step_batched``'s single-env semantics (same key
    threading via :func:`derive_step_key`, same post-CA Modify, same counts
    -based reward) with the lattice distributed: H/D-row bands per device,
    1-row ``ppermute`` halos for the stencil, agent write on the owning
    shard, ``psum`` for the global tree/fire counts.
    """
    n = mesh.shape[axis]
    h, w = core.nrows, core.ncols
    band = h // n
    assert h % n == 0, (h, n)
    assert core.repeater.max_repeats == 1, (
        "spatial step covers the one-CA-per-step regime (all big grids)"
    )

    was_done = state.done
    carry_key, roll = derive_step_key(state.key)
    success = core._wind > roll  # replicated global gust

    a_move, a_shoot = action[..., 0], action[..., 1]
    time_taken = (
        core._move_timings[a_move] + core._shoot_timings[a_shoot]
        + core._t_env_any
    )
    accu = state.context["time"] + time_taken
    frac, repeats = jnp.modf(accu)
    do_ca = (repeats >= 1.0) & jnp.logical_not(was_done)
    new_position = move_position(
        state.context["position"], a_move, h, w, core.move.drow, core.move.dcol
    )
    shoot = (a_shoot > 0) & jnp.logical_not(was_done)

    empty, tree, fire = core._empty, core._tree, core._fire

    def shard_fn(g_local, success, do_ca, position, shoot):
        idx = lax.axis_index(axis)
        g_ext = exchange_row_halos(g_local, axis, empty, n)
        ca = windy_step_from_success(
            g_ext, success, empty=empty, tree=tree, fire=fire
        )[1:-1]
        g2 = jnp.where(do_ca, ca, g_local)

        # Modify: the write lands on the shard owning the agent's row.
        local_r = position[0] - idx * band
        rows = lax.broadcasted_iota(TYPE_INT, (band, w), 0)
        cols = lax.broadcasted_iota(TYPE_INT, (band, w), 1)
        hit_arr = (
            (rows == local_r) & (cols == position[1]) & (g2 == tree) & shoot
        )
        g3 = jnp.where(hit_arr, empty, g2).astype(g_local.dtype)

        hit = lax.psum(jnp.sum(hit_arr.astype(TYPE_INT)), axis) > 0
        t = lax.psum(jnp.sum((g3 == tree).astype(TYPE_INT)), axis)
        f = lax.psum(jnp.sum((g3 == fire).astype(TYPE_INT)), axis)
        return g3, hit, t, f

    stepped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(), P()),
        out_specs=(P(axis, None), P(), P(), P()),
    )
    new_grid, hit, t_i, f_i = stepped(
        state.grid, success, do_ca, new_position, shoot
    )

    t = t_i.astype(TYPE_BOX)
    f = f_i.astype(TYPE_BOX)
    hit = jnp.where(was_done, state.context["hit"], hit)
    reward = jnp.where(
        was_done, jnp.asarray(0.0, TYPE_BOX), -(f / jnp.maximum(t + f, 1.0))
    )
    done = jnp.logical_or(was_done, f == 0)

    new_context = {
        "wind": state.context["wind"],
        "position": jnp.where(was_done, state.context["position"], new_position),
        "time": jnp.where(was_done, state.context["time"], frac.astype(TYPE_BOX)),
        "hit": hit,
        "pos_fire": state.context["pos_fire"],
        "tree_count": jnp.where(was_done, state.context["tree_count"], t_i),
        "fire_count": jnp.where(was_done, state.context["fire_count"], f_i),
    }
    new_state = EnvState(
        grid=new_grid,
        context=new_context,
        key=carry_key,
        done=done,
        steps_elapsed=state.steps_elapsed + jnp.where(was_done, 0, 1),
        reward_accumulated=state.reward_accumulated + reward,
    )
    out = StepOutput(
        obs=core.observe(new_state),
        reward=reward,
        terminated=done,
        truncated=jnp.zeros_like(done),
        info={"hit": hit},
    )
    return new_state, out


def advanced_step_spatial(
    ca, grid, per_env: dict, shared: dict, action, key, mesh: Mesh, *,
    axis: str = "data", t_eps: float = 1e-8,
):
    """One headless AdvancedBulldozer-physics step on a row-sharded grid.

    Composition (mirrors ``AdvancedForestFireBulldozerEnv._mdp_single``,
    reference ``advanced_bulldozer.py:1103-1127``, minus the RGB observation
    pipeline): sharded Alexandridis CA with halo exchange → Move →
    dousing write (a single-cell scatter the SPMD partitioner places on the
    owning shard) → time-step/day-night bookkeeping → reward
    ``-f/(t+f+eps)`` and done from globally-reduced cell counts.

    ``ca``: an :class:`~gymca_tpu.ops.alexandridis.AlexandridisCA`.
    ``per_env``: one env's context with H-leading terrain/state tensors
    row-sharded like ``grid``.  Returns ``(new_grid, new_per_env, reward,
    done)``.  The caller owns wind rotation (see
    ``alexandridis_step_spatial``) and key threading.
    """
    from gymca_tpu.parallel.spatial import alexandridis_step_spatial

    h, w = grid.shape
    k_ca, k_carry = jax.random.split(key)

    new_grid, new_fire_age = alexandridis_step_spatial(
        ca, grid, per_env, shared, k_ca, mesh, axis=axis
    )

    new_per_env = dict(per_env)
    new_per_env["fire_age"] = new_fire_age

    # Move (branchless, replicated scalars).
    from gymca_tpu.ops.move_modify import DEFAULT_DIRECTIONS, Move

    move = Move(DEFAULT_DIRECTIONS)
    position = move.update(new_grid, action[0], per_env["position"])[1]
    new_per_env["position"] = position

    # Dousing write — single-cell scatter; GSPMD routes it to the band
    # owning ``position[0]``.
    doused = new_per_env["dousing_count"].at[position[0], position[1]].set(1)
    new_per_env["dousing_count"] = jnp.where(
        action[1] == 1, doused, new_per_env["dousing_count"]
    )

    new_per_env["true_grid"] = new_grid
    new_per_env["time_step"] = per_env["time_step"] + 1
    new_per_env["is_night"] = jnp.where(
        new_per_env["time_step"] % shared["day_length"] == 0,
        1 - per_env["is_night"],
        per_env["is_night"],
    )
    new_per_env["key"] = k_carry

    t = jnp.sum(new_grid == ca.tree).astype(TYPE_BOX)
    f = jnp.sum(new_grid == ca.fire).astype(TYPE_BOX)
    reward = -(f / (t + f + t_eps))
    done = f == 0
    return new_grid, new_per_env, reward, done
