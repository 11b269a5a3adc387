"""Base-class contract pinned on a MINIMAL mock env (counterpart of the
reference's ``tests/mock_caenv.py:9-69`` + ``tests/identity.py:4-28``): an
8x8 ``CAEnvCore`` over an Identity operator with a step-counting context,
so every ``CAEnvCore``/``GymCAEnv``/``autoreset_step`` behavior is checked
in isolation from any real physics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.config import TYPE_BOX, TYPE_INT
from gymca_tpu.core.env import (
    CAEnvCore,
    EnvState,
    GymCAEnv,
    StepOutput,
    autoreset_step,
)
from gymca_tpu.core.operator import Operator
from gymca_tpu.core.spaces import (
    DiscreteSpec,
    GridSpec,
    TupleSpec,
)

H = W = 8
DONE_AFTER = 3  # mock terminates after 3 steps


class Identity(Operator):
    """No-op operator: returns grid/context unchanged (tests/identity.py)."""

    grid_dependant = True
    action_dependant = False
    context_dependant = True
    deterministic = True

    def update(self, grid, action, context, key=None):
        return grid, {"ticks": context["ticks"] + 1}


class MockCore(CAEnvCore):
    """Minimal functional env: Identity MDP, reward = -1 per live step,
    done when the context tick counter reaches DONE_AFTER."""

    def __init__(self):
        self.nrows, self.ncols = H, W
        self._identity = Identity()
        self.grid_spec = GridSpec(n=3, shape=(H, W))
        self.action_spec = DiscreteSpec(2)
        self.observation_spec = TupleSpec((self.grid_spec,))

    @property
    def mdp(self):
        return self._identity

    def initial_state(self, key) -> EnvState:
        k_grid, k_carry = jax.random.split(key)
        return EnvState(
            grid=self.grid_spec.sample(k_grid),
            context={"ticks": jnp.asarray(0, TYPE_INT)},
            key=k_carry,
            done=jnp.asarray(False),
            steps_elapsed=jnp.asarray(0, TYPE_INT),
            reward_accumulated=jnp.asarray(0.0, TYPE_BOX),
        )

    def _award(self, grid, context):
        return jnp.asarray(-1.0, TYPE_BOX)

    def _is_done(self, grid, context):
        return context["ticks"] >= DONE_AFTER

    def observe(self, state):
        return (state.grid,)


@pytest.fixture(scope="module")
def core():
    return MockCore()


def test_step_contract_and_termination_freeze(core, key):
    """Live steps tick / reward -1; after done the state FREEZES: grid and
    context unchanged, reward 0.0, steps_elapsed stops (ca_env.py:50-62)."""
    state = core.initial_state(key)
    for t in range(1, DONE_AFTER + 1):
        state, out = core.step(state, jnp.asarray(0))
        assert isinstance(out, StepOutput)
        assert float(out.reward) == -1.0
        assert int(state.steps_elapsed) == t
    assert bool(state.done)

    frozen_grid = np.asarray(state.grid)
    frozen_ticks = int(state.context["ticks"])
    state2, out2 = core.step(state, jnp.asarray(1))
    assert float(out2.reward) == 0.0
    assert bool(out2.terminated)
    np.testing.assert_array_equal(np.asarray(state2.grid), frozen_grid)
    assert int(state2.context["ticks"]) == frozen_ticks
    assert int(state2.steps_elapsed) == int(state.steps_elapsed)


def test_step_is_jit_vmap_safe(core, key):
    states = jax.vmap(core.initial_state)(jax.random.split(key, 4))
    step = jax.jit(jax.vmap(core.step, in_axes=(0, None)))
    for _ in range(DONE_AFTER + 2):
        states, out = step(states, jnp.asarray(0))
    assert bool(jnp.all(states.done))
    assert bool(jnp.all(out.reward == 0.0))


def test_autoreset_resamples_fresh_state(core, key):
    """autoreset_step restarts terminated envs from a FRESH key-sampled
    state (ticks back to 0, done cleared) while leaving live envs alone."""
    state = core.initial_state(key)
    for _ in range(DONE_AFTER):
        state, _ = core.step(state, jnp.asarray(0))
    assert bool(state.done)
    old_grid = np.asarray(state.grid)

    merged, out = autoreset_step(core, state, jnp.asarray(0))
    assert bool(out.terminated)  # the step that hit the reset still reports
    assert not bool(merged.done)
    assert int(merged.context["ticks"]) == 0
    assert int(merged.steps_elapsed) == 0
    # fresh grid is a new sample with probability ~1 (192 cells, 3 values)
    assert not np.array_equal(np.asarray(merged.grid), old_grid)


def test_gym_adapter_contract(core):
    """GymCAEnv over the mock: gym API, obs containment, graceful stepping
    after done with one warning (reference tests/test_ca_env.py:17-75)."""
    env = GymCAEnv(core, seed=11)
    obs0, info = env.reset(seed=11)
    assert np.asarray(obs0[0]).shape == (H, W)
    assert env.observation_space.contains(
        tuple(np.asarray(o) for o in obs0)
    )

    total = 0.0
    for t in range(DONE_AFTER):
        obs, r, done, trunc, info = env.step(0)
        total += r
    assert done and total == -float(DONE_AFTER)

    # graceful post-done step: reward 0.0, still done, no crash
    obs2, r2, done2, trunc2, info2 = env.step(1)
    assert r2 == 0.0 and done2
    assert env.steps_beyond_done >= 1

    # reset clears everything and the same seed reproduces the same grid
    obs3, _ = env.reset(seed=11)
    assert not env.done and env.steps_elapsed == 0
    np.testing.assert_array_equal(np.asarray(obs3[0]), np.asarray(obs0[0]))


def test_gym_adapter_seed_determinism(core):
    a = GymCAEnv(core, seed=5)
    b = GymCAEnv(core, seed=5)
    oa, _ = a.reset(seed=5)
    ob, _ = b.reset(seed=5)
    np.testing.assert_array_equal(np.asarray(oa[0]), np.asarray(ob[0]))


def test_count_cells(core, key):
    state = core.initial_state(key)
    counts = core.count_cells(state.grid, values=(0, 1, 2))
    assert sum(int(v) for v in counts.values()) == H * W
    g = np.asarray(state.grid)
    for v in (0, 1, 2):
        assert int(counts[v]) == int((g == v).sum())
