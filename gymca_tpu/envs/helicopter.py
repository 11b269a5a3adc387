"""ForestFireHelicopter — Drossel–Schwabl fire-fighting task.

Behavioral counterpart of reference ``forest_fire/helicopter/helicopter.py``:

* cells ``0/1/2 = empty/tree/fire`` (``helicopter.py:72-74``);
* ``p_fire=0.033``, ``p_tree=0.333`` (``helicopter.py:78-79``);
* the helicopter always "shoots" — effects ``{fire: empty}``
  (``helicopter.py:81, 225-230``);
* freeze counter instead of continuous time: the CA updates only when
  ``freeze == 0``, i.e. every ``max_freeze = int(speed*(nrows+ncols)/2)``
  steps (``helicopter.py:84, 220-236``);
* reward = weighted relative cell counts ``(0, +1, -1)``
  (``helicopter.py:120-135``); never terminates (``helicopter.py:137-138``).

TPU-native: the reference CA here is an O(H·W) *Python* loop
(``ca_DrosselSchwabl.py:37-64``); this core uses the vectorized stencil from
``gymca_tpu.ops.drossel`` — same rule table, massively faster, vmappable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gymca_tpu.config import TYPE_BOX, TYPE_INT
from gymca_tpu.core.env import CAEnvCore, EnvState, GymCAEnv
from gymca_tpu.core.operator import Operator
from gymca_tpu.core.spaces import (
    BoxSpec,
    DiscreteSpec,
    GridSpec,
    MultiDiscreteSpec,
    TupleSpec,
)
from gymca_tpu.ops.drossel import ForestFire
from gymca_tpu.ops.move_modify import DEFAULT_DIRECTIONS, Modify, Move, MoveModify

__all__ = ["HelicopterCore", "ForestFireHelicopterEnv"]


class HelicopterMDP(Operator):
    """Freeze-gated CA + always-shooting MoveModify (helicopter.py:198-236)."""

    grid_dependant = True
    action_dependant = True
    context_dependant = True
    deterministic = False

    def __init__(self, ca: ForestFire, move_modify: MoveModify, max_freeze: int,
                 **kwargs):
        super().__init__(**kwargs)
        self.ca = ca
        self.move_modify = move_modify
        self.max_freeze = max_freeze
        self.suboperators = (ca, move_modify)

    def update(self, grid, action, context, key=None):
        ca_params, position, freeze = (
            context["ca_params"],
            context["position"],
            context["freeze"],
        )
        k_ca, _ = jax.random.split(key)

        ca_grid, ca_params = self.ca(grid, None, ca_params, k_ca)
        do_ca = freeze == 0
        grid = jnp.where(do_ca, ca_grid, grid)

        shoot = jnp.asarray(1, TYPE_INT)  # helicopter always shoots
        grid, (position, hit) = self.move_modify(
            grid, (jnp.asarray(action, TYPE_INT), shoot), position
        )

        freeze = jnp.where(do_ca, self.max_freeze, freeze - 1).astype(TYPE_INT)
        return grid, {
            "ca_params": ca_params,
            "position": position,
            "freeze": freeze,
            "hit": hit,
        }


class HelicopterCore(CAEnvCore):
    def __init__(
        self,
        nrows: int,
        ncols: int,
        speed: float = 0.5,
        freeze: Optional[int] = None,
        p_fire: float = 0.033,
        p_tree: float = 0.333,
    ):
        self.nrows, self.ncols = nrows, ncols
        self.title = f"ForestFireHelicopter{nrows}x{ncols}"

        self._empty, self._tree, self._fire = 0, 1, 2
        self._p_fire, self._p_tree = p_fire, p_tree
        self._reward_per_empty = 0.0
        self._reward_per_tree = 1.0
        self._reward_per_fire = -1.0
        self._effects = {self._fire: self._empty}

        scale = (nrows + ncols) // 2
        self._max_freeze = int(speed * scale) if freeze is None else freeze

        self._set_specs()

        self.ca = ForestFire(self._empty, self._tree, self._fire)
        self.move = Move(DEFAULT_DIRECTIONS)
        self.modify = Modify(self._effects)
        self.move_modify = MoveModify(self.move, self.modify)
        self._mdp = HelicopterMDP(self.ca, self.move_modify, self._max_freeze)

    def _set_specs(self):
        nrows, ncols = self.nrows, self.ncols
        self.grid_spec = GridSpec(
            values=(self._empty, self._tree, self._fire), shape=(nrows, ncols)
        )
        self.ca_params_spec = BoxSpec(0.0, 1.0, shape=(2,))
        self.position_spec = MultiDiscreteSpec((nrows, ncols))
        self.freeze_spec = DiscreteSpec(self._max_freeze + 1)
        self.context_spec = TupleSpec(
            (self.ca_params_spec, self.position_spec, self.freeze_spec)
        )
        self.action_spec = DiscreteSpec(9)
        self.observation_spec = TupleSpec((self.grid_spec, self.context_spec))

    @property
    def mdp(self):
        return self._mdp

    def initial_state(self, key) -> EnvState:
        k_grid, k_carry = jax.random.split(key)
        grid = self.grid_spec.sample(k_grid)
        context = {
            "ca_params": jnp.asarray([self._p_fire, self._p_tree], TYPE_BOX),
            "position": jnp.asarray([self.nrows // 2, self.ncols // 2], TYPE_INT),
            "freeze": jnp.asarray(self._max_freeze, TYPE_INT),
            "hit": jnp.asarray(False),
        }
        return EnvState(
            grid=grid,
            context=context,
            key=k_carry,
            done=jnp.asarray(False),
            steps_elapsed=jnp.asarray(0, TYPE_INT),
            reward_accumulated=jnp.asarray(0.0, TYPE_BOX),
        )

    def observe(self, state: EnvState):
        c = state.context
        return state.grid, (c["ca_params"], c["position"], c["freeze"])

    def _award(self, grid, context):
        ncells = self.nrows * self.ncols
        counts = jnp.asarray(
            [
                jnp.sum(grid == self._empty),
                jnp.sum(grid == self._tree),
                jnp.sum(grid == self._fire),
            ],
            TYPE_BOX,
        )
        weights = jnp.asarray(
            [self._reward_per_empty, self._reward_per_tree, self._reward_per_fire],
            TYPE_BOX,
        )
        return jnp.dot(weights, counts / ncells)

    def _is_done(self, grid, context):
        return jnp.asarray(False)

    def _report(self, grid, context):
        return {"hit": context["hit"]}


class ForestFireHelicopterEnv(GymCAEnv):
    """Classic gymnasium-API Helicopter (drop-in for the reference env)."""

    def __init__(self, nrows, ncols, seed: Optional[int] = None, **kwargs):
        kwargs.pop("debug", None)
        core = HelicopterCore(nrows, ncols, **kwargs)
        super().__init__(core, seed=seed)
        self.title = core.title
        self._empty, self._tree, self._fire = core._empty, core._tree, core._fire

    def render(self):
        from gymca_tpu.utils.render import render_helicopter

        return render_helicopter(self)
