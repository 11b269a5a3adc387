"""Functional CA environment core + classic Gym adapter.

TPU-first split of the reference's ``CAEnv`` (``ca_env.py:9-99``):

* :class:`CAEnvCore` — a *pure functional* environment: ``initial_state(key)``
  and ``step(state, action)`` are jit/vmap/shard_map-safe pytree transforms.
  Batched execution is ``jax.vmap``; multi-chip is ``shard_map`` over a mesh
  (see ``gymca_tpu.parallel``).  Auto-reset happens *inside* jit with
  re-sampled initial states (fixing the reference's trace-frozen initial-state
  quirk, ``advanced_bulldozer.py:422-518``).
* :class:`GymCAEnv` — a thin stateful gymnasium adapter reproducing the
  reference's classic single-env semantics: graceful stepping after done
  (reward 0.0, one warning, ``steps_beyond_done`` counter — ``ca_env.py:50-62``),
  ``status()``, ``count_cells()``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.struct
import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import logger

from gymca_tpu.config import TYPE_BOX, TYPE_INT

__all__ = ["EnvState", "StepOutput", "CAEnvCore", "GymCAEnv", "autoreset_step"]


@flax.struct.dataclass
class EnvState:
    """State of one logical environment (a pytree; batch by vmapping)."""

    grid: jnp.ndarray  # (H, W) cell lattice
    context: Any  # env-specific pytree
    key: jnp.ndarray  # jax PRNG key for future stochasticity
    done: jnp.ndarray  # bool scalar
    steps_elapsed: jnp.ndarray  # int32 scalar
    reward_accumulated: jnp.ndarray  # float32 scalar


@flax.struct.dataclass
class StepOutput:
    obs: Any
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray
    info: dict


class CAEnvCore:
    """Pure functional CA environment.

    Subclasses define: ``mdp`` (an Operator), ``initial_grid(key)``,
    ``initial_context(key)``, ``_award(grid, context, prev_grid)``,
    ``_is_done(grid, context)``, ``observe(state)``.
    """

    nrows: int
    ncols: int

    # --- to implement ------------------------------------------------------

    @property
    def mdp(self):
        raise NotImplementedError

    def initial_state(self, key) -> EnvState:
        raise NotImplementedError

    def _award(self, grid, context) -> jnp.ndarray:
        raise NotImplementedError

    def _is_done(self, grid, context) -> jnp.ndarray:
        raise NotImplementedError

    def _report(self, grid, context) -> dict:
        return {}

    def observe(self, state: EnvState):
        """Observation = (grid, context) by default (reference ca_env.py:40)."""
        return state.grid, state.context

    # --- generic step machinery (pure) -------------------------------------

    def step(self, state: EnvState, action) -> Tuple[EnvState, StepOutput]:
        """One MDP transition.  Pure; safe under jit/vmap/scan.

        Termination-frozen semantics: once ``done``, further steps leave the
        state unchanged and give reward 0.0 (functional analog of reference
        ``ca_env.py:50-62``).
        """
        key, sub = jax.random.split(state.key)
        new_grid, new_context = self.mdp(state.grid, action, state.context, sub)

        was_done = state.done
        # Freeze the transition for finished envs.
        new_grid = jnp.where(was_done, state.grid, new_grid)
        new_context = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(was_done, (1,) * jnp.ndim(new)), old, new
            ),
            new_context,
            state.context,
        )

        done = jnp.logical_or(was_done, self._is_done(new_grid, new_context))
        reward = jnp.where(
            was_done, jnp.asarray(0.0, TYPE_BOX), self._award(new_grid, new_context)
        )

        new_state = EnvState(
            grid=new_grid,
            context=new_context,
            key=key,
            done=done,
            steps_elapsed=state.steps_elapsed + jnp.where(was_done, 0, 1),
            reward_accumulated=state.reward_accumulated + reward,
        )
        out = StepOutput(
            obs=self.observe(new_state),
            reward=reward,
            terminated=done,
            truncated=jnp.asarray(False),
            info=self._report(new_grid, new_context),
        )
        return new_state, out

    # --- convenience --------------------------------------------------------

    def reset(self, key) -> Tuple[EnvState, Any]:
        state = self.initial_state(key)
        return state, self.observe(state)

    def count_cells(self, grid, values) -> dict:
        """Per-value cell counts as a dict of scalars (device arrays)."""
        return {v: jnp.sum(grid == v) for v in values}


def autoreset_step(core: CAEnvCore, state: EnvState, action):
    """Step with in-jit auto-reset: terminated envs restart from a *fresh*
    initial state sampled with a new key (unlike the reference, whose
    ``conditional_reset`` merges trace-frozen initial states,
    ``advanced_bulldozer.py:432-518``)."""
    new_state, out = core.step(state, action)
    reset_key, carry_key = jax.random.split(new_state.key)
    fresh = core.initial_state(reset_key)

    def merge(fresh_leaf, cur_leaf):
        d = jnp.reshape(out.terminated, (1,) * jnp.ndim(fresh_leaf))
        return jnp.where(d, fresh_leaf, cur_leaf)

    merged = jax.tree.map(merge, fresh, new_state)
    merged = merged.replace(key=carry_key)
    return merged, out


class GymCAEnv(gym.Env):
    """Classic gymnasium adapter over a functional :class:`CAEnvCore`.

    Reproduces the reference ``CAEnv`` contract (``ca_env.py:27-99``):
    ``step`` after done warns once and returns reward ``0.0``; ``reset``
    resamples the initial state; ``status()`` and ``count_cells()`` helpers.
    """

    metadata = {"render_modes": ["human"], "render_mode": "rgb_array"}

    def __init__(self, core: CAEnvCore, seed: Optional[int] = None):
        self.core = core
        self.nrows, self.ncols = core.nrows, core.ncols
        self._key = jax.random.key(0 if seed is None else seed)
        self._state: Optional[EnvState] = None
        self.steps_beyond_done = 0
        self.done = False
        self.steps_elapsed = 0
        self.reward_accumulated = 0.0

        # gymnasium spaces from the core's specs
        self.action_space = core.action_spec.to_gymnasium()
        self.observation_space = core.observation_spec.to_gymnasium()

        self._jit_step = jax.jit(core.step)
        self._jit_reset = jax.jit(core.initial_state)

    # -- gym API -------------------------------------------------------------

    @property
    def grid(self):
        return np.asarray(self._state.grid)

    @property
    def context(self):
        return jax.tree.map(np.asarray, self._state.context)

    @property
    def state(self):
        return self.grid, self.context

    def reset(self, *, seed: Optional[int] = None, options: Optional[dict] = None):
        super().reset(seed=seed)
        if seed is not None:
            self._key = jax.random.key(seed)
        self._key, sub = jax.random.split(self._key)
        self._state = self._jit_reset(sub)
        self.done = False
        self.steps_elapsed = 0
        self.reward_accumulated = 0.0
        self.steps_beyond_done = 0
        obs = jax.tree.map(np.asarray, self.core.observe(self._state))
        return obs, self._host_info({})

    def step(self, action):
        if not self.done:
            action = jnp.asarray(action)
            self._state, out = self._jit_step(self._state, action)
            obs = jax.tree.map(np.asarray, out.obs)
            reward = float(out.reward)
            self.done = bool(out.terminated)
            self.steps_elapsed += 1
            self.reward_accumulated += reward
            return obs, reward, self.done, False, self._host_info(out.info)
        else:
            if self.steps_beyond_done == 0:
                logger.warn(
                    "You are calling 'step()' even though this "
                    "environment has already returned done = True. You "
                    "should always call 'reset()' once you receive 'done = "
                    "True' -- any further steps are undefined behavior."
                )
            self.steps_beyond_done += 1
            obs = jax.tree.map(np.asarray, self.core.observe(self._state))
            return obs, 0.0, True, False, self._host_info({})

    def status(self):
        return {
            "steps_elapsed": self.steps_elapsed,
            "reward_accumulated": self.reward_accumulated,
        }

    def count_cells(self, grid=None):
        """Returns dict of cell counts (reference ca_env.py:94-99)."""
        from collections import Counter

        grid = self.grid if grid is None else np.asarray(grid)
        return Counter(grid.flatten().tolist())

    def _host_info(self, info: dict) -> dict:
        return {k: np.asarray(v) for k, v in info.items()}

    def render(self):  # pragma: no cover - overridden by concrete envs
        return None
