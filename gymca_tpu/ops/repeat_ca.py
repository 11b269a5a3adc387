"""RepeatCA — decouples agent time from CA time.

Reference semantics (``operators/repeat_ca.py:32-45``): accumulate
``t_acting(action) + t_perception(state)`` into ``accu_time``; split with
``modf``; run the CA ``int(repeats)`` times, carry the fraction.

The data-dependent repeat count is the reference's hard part under jit (its
own JAX port gave up and always runs exactly ONE step while still carrying the
fraction — ``repeat_ca_jax.py:61-69``).  Here both semantics exist behind a
flag:

* ``mode="modf"``   — canonical: a *statically bounded* masked ``fori_loop``.
  The bound is computed once from the env's timing tables
  (``max_repeats = ceil(max step time) + 1``), so the compiled program is
  static-shape while the executed semantics match the NumPy reference.
* ``mode="single"`` — exactly one CA step per env-step (reference JAX-stack
  behavior, needed for PPO-curve parity with ``jax_ppo.py``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from gymca_tpu.config import TYPE_BOX
from gymca_tpu.core.operator import Operator

__all__ = ["RepeatCA"]


class RepeatCA(Operator):
    grid_dependant = True
    action_dependant = True
    context_dependant = True

    def __init__(
        self,
        cellular_automaton: Operator,
        t_acting: Callable,
        t_perception: Callable,
        max_repeats: int = 2,
        mode: str = "modf",
        **kwargs,
    ):
        super().__init__(**kwargs)
        assert mode in ("modf", "single")
        self.ca = cellular_automaton
        self.t_acting = t_acting
        self.t_perception = t_perception
        self.max_repeats = int(max_repeats)
        self.mode = mode
        self.suboperators = (self.ca,)
        self.deterministic = self.ca.deterministic

    def update(self, grid, action, context, key=None):
        ca_params, accu_time = context

        time_taken = self.t_acting(action) + self.t_perception((grid, context))
        accu = accu_time + time_taken
        frac, repeats = jnp.modf(accu)
        repeats = repeats.astype(jnp.int32)

        if self.mode == "single":
            new_grid, new_params = self.ca(grid, action, ca_params, key)
            return new_grid, (new_params, frac.astype(TYPE_BOX))

        keys = jax.random.split(key, self.max_repeats)

        def body(i, carry):
            grid, ca_params = carry
            new_grid, new_params = self.ca(grid, action, ca_params, keys[i])
            pred = i < repeats
            grid = jnp.where(pred, new_grid, grid)
            ca_params = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(pred, (1,) * jnp.ndim(new)), new, old
                ),
                new_params,
                ca_params,
            )
            return grid, ca_params

        grid, ca_params = jax.lax.fori_loop(
            0, self.max_repeats, body, (grid, ca_params)
        )
        return grid, (ca_params, frac.astype(TYPE_BOX))
