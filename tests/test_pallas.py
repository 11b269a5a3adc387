"""Interpret-mode parity tests for the fused Pallas bulldozer kernel.

The fused single-pass kernel (``ops/pallas_kernels.py``) must be bit-identical
to the unfused XLA path: same integer stencil arithmetic as
``windy_step`` (``ops/windy.py``), same key threading as
``vmap(BulldozerCore.step)``.  These run the kernel in Pallas interpret mode
on CPU; on TPU the same code compiles through Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.envs.bulldozer import BulldozerCore
from gymca_tpu.ops.pallas_kernels import windy_fused_step, windy_weights_from_roll
from gymca_tpu.ops.windy import PROPAGATION, windy_step

N_ENVS = 3
H, W = 16, 128  # small but TPU-tileable (float32/int32 tile = 8 x 128)


@pytest.fixture(scope="module")
def core():
    return BulldozerCore(H, W, grid_dtype=jnp.int32)


def test_supports_fused(core):
    assert core.supports_fused_step()
    assert not BulldozerCore(8, 8).supports_fused_step()
    # dtype-aware tile gate (ADVICE r1): int8 needs (32, 128) alignment
    assert not BulldozerCore(16, 128, grid_dtype=jnp.int8).supports_fused_step()
    assert BulldozerCore(32, 128, grid_dtype=jnp.int8).supports_fused_step()


def test_weights_from_roll_matches_windy_gating(key):
    wind = jax.random.uniform(jax.random.fold_in(key, 1), (3, 3))
    roll = jax.random.uniform(key, (3, 3))
    weights = windy_weights_from_roll(wind, roll)
    assert weights.shape == (8,)
    assert set(np.asarray(weights).tolist()) <= {0, PROPAGATION}


def test_kernel_matches_windy_step(key):
    """Pure-CA parity: kernel with shoot=0, do_ca=1 == windy_step."""
    empty, tree, fire = 0, 3, 25
    k_grid, k_roll = jax.random.split(key)
    grid = jax.random.choice(
        k_grid, jnp.asarray([empty, tree, fire]), (N_ENVS, H, W)
    ).astype(jnp.int32)
    wind = jnp.full((3, 3), 0.7).at[1, 1].set(0.0)

    rolls = jax.random.uniform(k_roll, (N_ENVS, 3, 3), dtype=jnp.float32)
    expected = jax.vmap(
        lambda g, k: windy_step(g, wind, k, empty=empty, tree=tree, fire=fire)
    )(grid, jax.random.split(k_roll, N_ENVS))
    # windy_step draws its own roll from the key; redo with explicit rolls for
    # an apples-to-apples check instead:
    keys = jax.random.split(k_roll, N_ENVS)
    rolls = jax.vmap(lambda k: jax.random.uniform(k, (3, 3), dtype=jnp.float32))(keys)
    weights = windy_weights_from_roll(wind, rolls)
    params = jnp.tile(jnp.asarray([[1, 0, 0, 0]], jnp.int32), (N_ENVS, 1))
    got, counts = windy_fused_step(
        grid, weights, params, empty=empty, tree=tree, fire=fire, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
    np.testing.assert_array_equal(
        np.asarray(counts[:, 0]), np.asarray((expected == tree).sum((1, 2)))
    )
    np.testing.assert_array_equal(
        np.asarray(counts[:, 1]), np.asarray((expected == fire).sum((1, 2)))
    )


def test_kernel_do_ca_zero_keeps_grid(key):
    grid = jax.random.choice(key, jnp.asarray([0, 3, 25]), (2, H, W)).astype(
        jnp.int32
    )
    weights = jnp.full((2, 8), PROPAGATION, jnp.int32)
    params = jnp.tile(jnp.asarray([[0, 0, 0, 0]], jnp.int32), (2, 1))
    got, _ = windy_fused_step(
        grid, weights, params, empty=0, tree=3, fire=25, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(grid))


def test_kernel_modify_hit(key):
    """Shooting a tree cell (CA skipped) empties it and reports hit; only
    the hit column is defined for modify rows (sparse-counts contract —
    tree/fire counts for skipped envs are reconciled by the caller)."""
    grid = jnp.full((1, H, W), 3, jnp.int32)  # all trees, no fire
    weights = jnp.zeros((1, 8), jnp.int32)
    params = jnp.asarray([[0, 5, 7, 1]], jnp.int32)
    got, counts = windy_fused_step(
        grid, weights, params, empty=0, tree=3, fire=25, interpret=True
    )
    assert got[0, 5, 7] == 0
    assert counts[0, 2] == 1  # hit
    # shooting an (already emptied) cell: no hit, grid untouched
    got2, counts2 = windy_fused_step(
        got, weights, params, empty=0, tree=3, fire=25, interpret=True
    )
    assert counts2[0, 2] == 0
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(got))


def test_step_batched_parity_with_vmap_step(core, key):
    """Full env-step parity: fused batched path == vmap(step), many steps."""
    keys = jax.random.split(key, N_ENVS)
    states_a = jax.vmap(core.initial_state)(keys)
    states_b = states_a

    step_vmap = jax.jit(jax.vmap(core.step))
    step_fused = jax.jit(
        lambda s, a: core.step_batched(s, a, interpret=True)
    )

    k_act = jax.random.fold_in(key, 99)
    for i in range(12):
        k_act, k1, k2 = jax.random.split(k_act, 3)
        actions = jnp.stack(
            [
                jax.random.randint(k1, (N_ENVS,), 0, 9),
                jax.random.randint(k2, (N_ENVS,), 0, 2),
            ],
            axis=-1,
        )
        states_a, out_a = step_vmap(states_a, actions)
        states_b, out_b = step_fused(states_b, actions)

        # Fused-path grids defer Modify writes into the edit log; the
        # materialized view must be bit-identical to the eager path.
        np.testing.assert_array_equal(
            np.asarray(states_a.grid),
            np.asarray(core.materialize_grid(states_b)),
            err_msg=f"step {i}",
        )
        np.testing.assert_array_equal(
            np.asarray(states_a.context["tree_count"]),
            np.asarray(states_b.context["tree_count"]),
        )
        np.testing.assert_array_equal(
            np.asarray(states_a.context["fire_count"]),
            np.asarray(states_b.context["fire_count"]),
        )
        np.testing.assert_array_equal(
            np.asarray(states_a.context["position"]),
            np.asarray(states_b.context["position"]),
        )
        np.testing.assert_allclose(
            np.asarray(states_a.context["time"]),
            np.asarray(states_b.context["time"]),
            rtol=0, atol=0,
        )
        np.testing.assert_array_equal(
            np.asarray(out_a.reward), np.asarray(out_b.reward)
        )
        np.testing.assert_array_equal(
            np.asarray(out_a.terminated), np.asarray(out_b.terminated)
        )
        np.testing.assert_array_equal(
            np.asarray(out_a.info["hit"]), np.asarray(out_b.info["hit"])
        )
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(states_a.key)),
            np.asarray(jax.random.key_data(states_b.key)),
        )


def test_int8_step_batched_parity(key):
    """int8 grid storage (the production default): fused == vmap(step)."""
    core8 = BulldozerCore(32, 128)  # default grid_dtype=int8
    assert core8._grid_dtype == jnp.int8
    assert core8.supports_fused_step()
    keys = jax.random.split(key, 2)
    states_a = jax.vmap(core8.initial_state)(keys)
    assert states_a.grid.dtype == jnp.int8
    states_b = states_a
    step_vmap = jax.jit(jax.vmap(core8.step))
    step_fused = jax.jit(lambda s, a: core8.step_batched(s, a, interpret=True))
    k_act = jax.random.fold_in(key, 7)
    for i in range(4):
        k_act, k1, k2 = jax.random.split(k_act, 3)
        actions = jnp.stack(
            [jax.random.randint(k1, (2,), 0, 9),
             jax.random.randint(k2, (2,), 0, 2)], axis=-1)
        states_a, out_a = step_vmap(states_a, actions)
        states_b, out_b = step_fused(states_b, actions)
        np.testing.assert_array_equal(
            np.asarray(states_a.grid),
            np.asarray(core8.materialize_grid(states_b)),
            err_msg=f"step {i}")
        np.testing.assert_array_equal(
            np.asarray(out_a.reward), np.asarray(out_b.reward))


def test_deferred_edit_log(core, key):
    """Between CA applications the fused path defers Modify writes into
    ``context['edit_log']`` (the HBM grid stays stale until materialized);
    repeat shots at a pending cell must not double-hit; the log flushes into
    the grid at the env's next CA application."""
    assert core._edit_log_k >= 1
    states = jax.vmap(core.initial_state)(jax.random.split(key, 1))
    pos = np.asarray(states.context["position"][0])
    # make the target cell a tree so the first shot hits
    grid = states.grid.at[0, pos[0], pos[1]].set(3)
    states = states.replace(
        grid=grid,
        context={
            **states.context,
            "tree_count": jnp.sum(grid == 3, axis=(1, 2)).astype(
                states.context["tree_count"].dtype
            ),
        },
    )
    shoot_in_place = jnp.asarray([[4, 1]], jnp.int32)  # not_move + shoot

    states1, out1 = core.step_batched(states, shoot_in_place, interpret=True)
    assert not bool(states1.done[0]), "episode should still be live"
    if int(states1.context["edit_count"][0]) == 0:
        pytest.skip("first step crossed a CA period; log never exercised")
    # hit reported, tree count decremented, but the HBM grid is stale...
    assert bool(out1.info["hit"][0])
    assert int(states1.grid[0, pos[0], pos[1]]) == 3
    # ...while the materialized view shows the write
    assert int(core.materialize_grid(states1)[0, pos[0], pos[1]]) == 0
    tree_count_1 = int(states1.context["tree_count"][0])

    # a second shot at the same (pending) cell must not hit again
    states2, out2 = core.step_batched(states1, shoot_in_place, interpret=True)
    assert not bool(out2.info["hit"][0])
    assert int(states2.context["tree_count"][0]) == tree_count_1

    # step until the CA fires: the log flushes into the HBM grid
    for _ in range(8):
        cnt_before = int(states2.context["edit_count"][0])
        states2, _ = core.step_batched(states2, shoot_in_place, interpret=True)
        if int(states2.context["edit_count"][0]) < cnt_before:
            break
    else:
        pytest.fail("CA never fired within 8 shoot steps")
    assert int(states2.grid[0, pos[0], pos[1]]) == 0  # flushed eagerly now


def test_edit_log_overflow_matches_vmap_step(key):
    """Edit-log OVERFLOW class (envs/bulldozer.py:427-441): timings tuned so
    the 64-entry cap binds.  delta = t_shoot + t_any = 0.0051 wants
    floor(1/delta)+1 = 197 slots -> capped at 64; step time 0.0145 crosses
    the CA period only at step 69.  A move-right+shoot policy over an
    all-tree row therefore: logs hits at steps 1..64, OVERFLOWS (kernel
    eager-modify class) at steps 65..68, then flushes the full log at the
    step-69 CA application — with pending edits and an overflow write
    interleaved.  Every step must match the eager ``vmap(step)`` path
    bit-for-bit on materialized grid, reward, hit, and counts."""
    core = BulldozerCore(
        H, W, grid_dtype=jnp.int32,
        t_move=0.0094, t_shoot=0.005, t_any=0.0001,
        pos_bull=(8, 4), pos_fire=(15, 120),
    )
    assert core._edit_log_k == 64
    assert core.supports_fused_step()

    states = jax.vmap(core.initial_state)(jax.random.split(key, 1))
    # all-tree grid with one remote fire to keep the episode live
    grid = jnp.full_like(states.grid, 3).at[0, 15, 120].set(25)
    states = states.replace(
        grid=grid,
        context={
            **states.context,
            "tree_count": jnp.sum(grid == 3, axis=(1, 2)).astype(
                states.context["tree_count"].dtype
            ),
            "fire_count": jnp.sum(grid == 25, axis=(1, 2)).astype(
                states.context["fire_count"].dtype
            ),
        },
    )
    states_eager = states
    act = jnp.asarray([[5, 1]], jnp.int32)  # move right + shoot
    eager_step = jax.jit(jax.vmap(core.step))

    saw_overflow = saw_flush = False
    for step in range(1, 73):
        cnt_before = int(states.context["edit_count"][0])
        states, out = core.step_batched(states, act, interpret=True)
        states_eager, out_eager = eager_step(states_eager, act)
        cnt = int(states.context["edit_count"][0])

        np.testing.assert_array_equal(
            np.asarray(core.materialize_grid(states)),
            np.asarray(states_eager.grid),
            err_msg=f"step {step}",
        )
        assert float(out.reward[0]) == float(out_eager.reward[0]), step
        assert bool(out.info["hit"][0]) == bool(out_eager.info["hit"][0]), step
        for k in ("tree_count", "fire_count", "time"):
            np.testing.assert_allclose(
                np.asarray(states.context[k]),
                np.asarray(states_eager.context[k]),
                err_msg=f"step {step} {k}",
            )

        if cnt == 64 and cnt_before == 64 and bool(out.info["hit"][0]):
            # overflow: hit with a FULL log -> the kernel wrote eagerly;
            # the raw (unmaterialized) grid must already show the write
            saw_overflow = True
            pos = np.asarray(states.context["position"][0])
            assert int(states.grid[0, pos[0], pos[1]]) == 0, step
        if cnt < cnt_before:
            saw_flush = True  # CA application replayed + cleared the log
            assert cnt == 0, step

    assert saw_overflow, "timings never made the edit-log cap bind"
    assert saw_flush, "CA never fired; flush path not exercised"
    assert not bool(states.done[0])


def test_step_batched_done_freeze(core, key):
    """Finished envs: grid frozen, reward 0, counters frozen."""
    keys = jax.random.split(key, 2)
    states = jax.vmap(core.initial_state)(keys)
    # Mark env 0 done with a stale hit flag
    states = states.replace(done=jnp.asarray([True, False]))
    states = states.replace(
        context={**states.context, "hit": jnp.asarray([True, False])}
    )
    actions = jnp.asarray([[5, 1], [5, 1]], jnp.int32)
    new_states, out = core.step_batched(states, actions, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(new_states.grid[0]), np.asarray(states.grid[0])
    )
    assert float(out.reward[0]) == 0.0
    assert bool(out.terminated[0])
    assert int(new_states.steps_elapsed[0]) == int(states.steps_elapsed[0])
    np.testing.assert_array_equal(
        np.asarray(new_states.context["position"][0]),
        np.asarray(states.context["position"][0]),
    )
    # frozen context keeps the stale hit (matches vmap(step) freeze semantics)
    assert bool(new_states.context["hit"][0])
    assert bool(out.info["hit"][0])


def test_swar_stencil_matches_boolean(key):
    """SWAR (byte-packed) stencil bit-identity vs the boolean int32 path:
    same grids, gusts, shoots, and deferred edits through both ``stencil``
    values on an int8 grid — outputs and counts must match exactly,
    including hit reporting and mid-plane/edge fire fronts."""
    empty, tree, fire = 0, 3, 25
    h, w = 32, 128  # int8 min tile (32, 128)
    n = 4
    k_grid, k_roll, k_pos = jax.random.split(key, 3)
    grid = jax.random.choice(
        k_grid,
        jnp.asarray([empty, tree, fire], jnp.int8),
        (n, h, w),
        p=jnp.asarray([0.2, 0.7, 0.1]),
    )
    wind = jax.random.uniform(k_roll, (3, 3))
    rolls = jax.vmap(
        lambda k: jax.random.uniform(k, (3, 3), dtype=jnp.float32)
    )(jax.random.split(k_roll, n))
    weights = windy_weights_from_roll(wind, rolls)
    rows = jax.random.randint(k_pos, (n,), 0, h)
    cols = jax.random.randint(jax.random.fold_in(k_pos, 1), (n,), 0, w)
    params = jnp.stack(
        [jnp.asarray([1, 1, 1, 1]), rows, cols, jnp.asarray([1, 0, 1, 0])],
        axis=-1,
    ).astype(jnp.int32)
    edits = jnp.zeros((n, 2), jnp.int32).at[0, 0].set(
        3 | (17 << 16)
    ).at[0, 1].set(9 | (64 << 16))
    edit_counts = jnp.asarray([2, 0, 0, 0], jnp.int32)
    outs = {}
    for stencil in ("boolean", "swar"):
        outs[stencil] = windy_fused_step(
            grid, weights, params, edits, edit_counts,
            empty=empty, tree=tree, fire=fire,
            interpret=True, stencil=stencil,
        )
    np.testing.assert_array_equal(
        np.asarray(outs["swar"][0]), np.asarray(outs["boolean"][0])
    )
    np.testing.assert_array_equal(
        np.asarray(outs["swar"][1]), np.asarray(outs["boolean"][1])
    )
    # and vs the unfused XLA rule on the same int8 grids (drop the edits,
    # whose semantics the XLA path applies eagerly instead)
    params_ca = params.at[:, 3].set(0)
    got, _ = windy_fused_step(
        grid, weights, params_ca,
        empty=empty, tree=tree, fire=fire,
        interpret=True, stencil="swar",
    )
    from gymca_tpu.ops.windy import windy_step_from_success

    for e in range(n):
        exp = windy_step_from_success(
            grid[e].astype(jnp.int32), wind > rolls[e],
            empty=empty, tree=tree, fire=fire,
        )
        np.testing.assert_array_equal(
            np.asarray(got[e], dtype=np.int32), np.asarray(exp)
        )
