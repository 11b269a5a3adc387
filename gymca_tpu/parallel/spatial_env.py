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

__all__ = [
    "bulldozer_step_spatial",
    "shard_state",
    "advanced_step_spatial",
    "bulldozer_step_batched_spatial",
    "advanced_step_batched_spatial",
    "shard_state_batched",
]


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
    if "edit_log" in state.context:  # eager writes here: log rides empty
        new_context["edit_log"] = state.context["edit_log"]
        new_context["edit_count"] = state.context["edit_count"]
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


def shard_state_batched(
    states: EnvState, mesh: Mesh, *, data_axis: str = "data",
    space_axis: str = "space",
) -> EnvState:
    """Place a BATCH of env states on a ('data', 'space') 2-D mesh: the env
    axis shards over ``data_axis``, each grid's rows over ``space_axis``,
    everything else over ``data_axis`` alone."""
    d, s = mesh.shape[data_axis], mesh.shape[space_axis]

    def place(x):
        if not hasattr(x, "ndim"):
            return x
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(
                place(jax.random.key_data(x)), impl=jax.random.key_impl(x)
            )
        if x.ndim == 3 and x.shape[0] % d == 0 and x.shape[1] % s == 0:
            return jax.device_put(
                x, NamedSharding(mesh, P(data_axis, space_axis, None))
            )
        if x.ndim >= 1 and x.shape[0] % d == 0:
            return jax.device_put(
                x, NamedSharding(mesh, P(*((data_axis,) + (None,) * (x.ndim - 1))))
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, states)


def bulldozer_step_batched_spatial(
    core: BulldozerCore, states: EnvState, actions, mesh: Mesh, *,
    data_axis: str = "data", space_axis: str = "space",
):
    """Batch x spatial composition: N Bulldozer envs stepped at once, the env
    axis sharded over ``data_axis`` and EVERY grid row-sharded over
    ``space_axis`` — the fusion of ``parallel/sharded.py``'s data
    parallelism with :func:`bulldozer_step_spatial`'s halo-exchange grids on
    one ('data', 'space') 2-D mesh.

    One shard_map program steps a (N/d, H/s, W) block: halos for ALL local
    envs move in a single batched ``ppermute`` pair along ``space_axis``
    (collective volume O(N/d * W) per step), the stencil vmaps over the
    local env axis, the agent writes land on the owning band, and per-env
    tree/fire counts ``psum`` over ``space_axis`` only.  Key threading
    matches ``vmap(core.step)`` (via :func:`derive_step_key`), so results
    are bit-identical to the single-device batched step for ANY mesh shape —
    ``tests/test_spatial_env.py`` pins shard-count invariance.
    """
    d = mesh.shape[data_axis]
    n_s = mesh.shape[space_axis]
    h, w = core.nrows, core.ncols
    band = h // n_s
    n_envs = states.grid.shape[0]
    assert h % n_s == 0, (h, n_s)
    assert n_envs % d == 0, (n_envs, d)
    assert core.repeater.max_repeats == 1

    was_done = states.done
    carry_keys, rolls = jax.vmap(derive_step_key)(states.key)
    success = core._wind > rolls  # (N, 3, 3)

    a_move, a_shoot = actions[..., 0], actions[..., 1]
    time_taken = (
        core._move_timings[a_move] + core._shoot_timings[a_shoot]
        + core._t_env_any
    )
    accu = states.context["time"] + time_taken
    frac, repeats = jnp.modf(accu)
    do_ca = (repeats >= 1.0) & jnp.logical_not(was_done)
    new_position = move_position(
        states.context["position"], a_move, h, w, core.move.drow, core.move.dcol
    )
    shoot = (a_shoot > 0) & jnp.logical_not(was_done)

    empty, tree, fire = core._empty, core._tree, core._fire

    def shard_fn(g_local, success, do_ca, position, shoot):
        # g_local: (N/d, band, W) — this device's envs' row bands.
        idx = lax.axis_index(space_axis)
        down = [(j, (j + 1) % n_s) for j in range(n_s)]
        up = [(j, (j - 1) % n_s) for j in range(n_s)]
        fill = jnp.asarray(empty, g_local.dtype)
        top = jnp.where(
            idx == 0, fill, lax.ppermute(g_local[:, -1:, :], space_axis, down)
        )
        bot = jnp.where(
            idx == n_s - 1, fill,
            lax.ppermute(g_local[:, :1, :], space_axis, up),
        )
        g_ext = jnp.concatenate([top, g_local, bot], axis=1)
        ca = jax.vmap(
            lambda g, s: windy_step_from_success(
                g, s, empty=empty, tree=tree, fire=fire
            )
        )(g_ext, success)[:, 1:-1]
        g2 = jnp.where(do_ca[:, None, None], ca, g_local)

        local_r = position[:, 0] - idx * band
        rows = lax.broadcasted_iota(TYPE_INT, (band, w), 0)[None]
        cols = lax.broadcasted_iota(TYPE_INT, (band, w), 1)[None]
        hit_arr = (
            (rows == local_r[:, None, None])
            & (cols == position[:, 1][:, None, None])
            & (g2 == tree)
            & shoot[:, None, None]
        )
        g3 = jnp.where(hit_arr, empty, g2).astype(g_local.dtype)

        hit = lax.psum(
            jnp.sum(hit_arr.astype(TYPE_INT), axis=(1, 2)), space_axis
        ) > 0
        t = lax.psum(
            jnp.sum((g3 == tree).astype(TYPE_INT), axis=(1, 2)), space_axis
        )
        f = lax.psum(
            jnp.sum((g3 == fire).astype(TYPE_INT), axis=(1, 2)), space_axis
        )
        return g3, hit, t, f

    stepped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(data_axis, space_axis, None),
            P(data_axis),
            P(data_axis),
            P(data_axis),
            P(data_axis),
        ),
        out_specs=(
            P(data_axis, space_axis, None),
            P(data_axis),
            P(data_axis),
            P(data_axis),
        ),
    )
    new_grid, hit, t_i, f_i = stepped(
        states.grid, success, do_ca, new_position, shoot
    )

    t = t_i.astype(TYPE_BOX)
    f = f_i.astype(TYPE_BOX)
    hit = jnp.where(was_done, states.context["hit"], hit)
    reward = jnp.where(
        was_done, jnp.asarray(0.0, TYPE_BOX), -(f / jnp.maximum(t + f, 1.0))
    )
    done = jnp.logical_or(was_done, f == 0)

    new_context = {
        "wind": states.context["wind"],
        "position": jnp.where(
            was_done[..., None], states.context["position"], new_position
        ),
        "time": jnp.where(
            was_done, states.context["time"], frac.astype(TYPE_BOX)
        ),
        "hit": hit,
        "pos_fire": states.context["pos_fire"],
        "tree_count": jnp.where(was_done, states.context["tree_count"], t_i),
        "fire_count": jnp.where(was_done, states.context["fire_count"], f_i),
    }
    if "edit_log" in states.context:  # eager writes here: log rides empty
        new_context["edit_log"] = states.context["edit_log"]
        new_context["edit_count"] = states.context["edit_count"]
    new_states = EnvState(
        grid=new_grid,
        context=new_context,
        key=carry_keys,
        done=done,
        steps_elapsed=states.steps_elapsed + jnp.where(was_done, 0, 1),
        reward_accumulated=states.reward_accumulated + reward,
    )
    out = StepOutput(
        obs=core.observe(new_states),
        reward=reward,
        terminated=done,
        truncated=jnp.zeros_like(done),
        info={"hit": hit},
    )
    return new_states, out


def advanced_step_batched_spatial(
    ca, grids, per_envs: dict, shared: dict, actions, keys, mesh: Mesh, *,
    data_axis: str = "data", space_axis: str = "space", t_eps: float = 1e-8,
):
    """Batch x spatial composition for the FLAGSHIP physics: N Advanced
    (Alexandridis) envs, env axis over ``data_axis``, every grid row-sharded
    over ``space_axis``.

    vmaps :func:`advanced_step_spatial`'s per-env logic over the local env
    shard inside the 2-D mesh's partitioning: H-leading per-env tensors
    (grids, fire_age, dousing, terrain) shard as P(data, space, ...),
    scalars as P(data); the Alexandridis halo exchange batches over the
    local envs.  Headless like :func:`advanced_step_spatial`.  Returns
    ``(new_grids, new_per_envs, rewards, dones)``.
    """
    n_s = mesh.shape[space_axis]
    h, w = grids.shape[1], grids.shape[2]
    r = max(ca.burn_kernel_radius, 2)
    band = h // n_s
    assert h % n_s == 0 and r <= band, (h, n_s, r)

    ks = jax.vmap(jax.random.split)(keys)  # (N, 2)
    k_ca, k_carry = ks[:, 0], ks[:, 1]

    # Split per-env context into row-sharded tensors / exp_slope / scalars
    # (same partition rule as alexandridis_step_spatial, plus the env axis).
    row_ctx = {
        k: v for k, v in per_envs.items()
        if k not in ("exp_slope", "key")
        and hasattr(v, "ndim") and v.ndim >= 3 and v.shape[1] == h
    }
    scal_ctx = {
        k: v for k, v in per_envs.items()
        if k not in row_ctx and k not in ("exp_slope", "key")
    }
    exp_slope = per_envs["exp_slope"]  # (N, 3, 3, H, W)
    row_ctx["true_grid"] = grids

    def shard_fn(row_ctx, es_local, scal_ctx, shared, keys):
        idx = lax.axis_index(space_axis)
        down = [(j, (j + 1) % n_s) for j in range(n_s)]
        up = [(j, (j - 1) % n_s) for j in range(n_s)]

        def extend(v, fill):
            # v: (n_loc, band, ...) — batched halo exchange along rows.
            top = jnp.where(
                idx == 0, jnp.asarray(fill, v.dtype),
                lax.ppermute(v[:, -r:], space_axis, down),
            )
            bot = jnp.where(
                idx == n_s - 1, jnp.asarray(fill, v.dtype),
                lax.ppermute(v[:, :r], space_axis, up),
            )
            return jnp.concatenate([top, v, bot], axis=1)

        ctx_ext = {
            k: extend(v, ca.empty if k == "true_grid" else 0)
            for k, v in row_ctx.items()
        }
        g_ext = ctx_ext.pop("true_grid")
        es_ext = jnp.concatenate(
            [
                jnp.where(
                    idx == 0, 1.0,
                    lax.ppermute(es_local[..., -r:, :], space_axis, down),
                ),
                es_local,
                jnp.where(
                    idx == n_s - 1, 1.0,
                    lax.ppermute(es_local[..., :r, :], space_axis, up),
                ),
            ],
            axis=-2,
        )

        def one_env(g_ext, ctx_ext, es_ext, scal, key):
            pe = {**scal, **ctx_ext, "exp_slope": es_ext}
            shard_key = jax.random.fold_in(key, idx)
            new_ext, (new_pe, _) = ca.update(
                g_ext, None, (pe, shared), shard_key
            )
            return new_ext[r:-r], new_pe["fire_age"][r:-r]

        new_g, new_fa = jax.vmap(one_env, in_axes=(0, 0, 0, 0, 0))(
            g_ext, ctx_ext, es_ext, scal_ctx, keys
        )
        return new_g, new_fa

    stepped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            {k: P(data_axis, space_axis) for k in row_ctx},
            P(data_axis, None, None, space_axis, None),
            jax.tree.map(lambda _: P(data_axis), scal_ctx),
            jax.tree.map(lambda _: P(), shared),
            P(data_axis),
        ),
        out_specs=(P(data_axis, space_axis, None), P(data_axis, space_axis, None)),
    )
    new_grids, new_fire_age = stepped(row_ctx, exp_slope, scal_ctx, shared, k_ca)

    new_per_envs = dict(per_envs)
    new_per_envs["fire_age"] = new_fire_age

    from gymca_tpu.ops.move_modify import DEFAULT_DIRECTIONS, Move

    move = Move(DEFAULT_DIRECTIONS)
    position = jax.vmap(
        lambda g, a, p: move.update(g, a, p)[1]
    )(new_grids, actions[:, 0], per_envs["position"])
    new_per_envs["position"] = position

    env_ids = jnp.arange(grids.shape[0])
    doused = new_per_envs["dousing_count"].at[
        env_ids, position[:, 0], position[:, 1]
    ].set(1)
    new_per_envs["dousing_count"] = jnp.where(
        (actions[:, 1] == 1)[:, None, None],
        doused, new_per_envs["dousing_count"],
    )

    new_per_envs["true_grid"] = new_grids
    new_per_envs["time_step"] = per_envs["time_step"] + 1
    new_per_envs["is_night"] = jnp.where(
        new_per_envs["time_step"] % shared["day_length"] == 0,
        1 - per_envs["is_night"],
        per_envs["is_night"],
    )
    new_per_envs["key"] = k_carry

    t = jnp.sum(new_grids == ca.tree, axis=(1, 2)).astype(TYPE_BOX)
    f = jnp.sum(new_grids == ca.fire, axis=(1, 2)).astype(TYPE_BOX)
    rewards = -(f / (t + f + t_eps))
    dones = f == 0
    return new_grids, new_per_envs, rewards, dones


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
