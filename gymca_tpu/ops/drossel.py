"""Drossel–Schwabl forest-fire CA — vectorized stencil.

Rule table (reference ``operators/ca_DrosselSchwabl.py:32-66``, which runs an
O(H·W) *Python* double loop with per-cell ``np.random.choice``):

* tree with >=1 fire Moore neighbor     -> fire
* tree otherwise                        -> fire w.p. ``p_fire`` (lightning)
* empty                                 -> tree w.p. ``p_tree`` (growth)
* fire                                  -> empty (burn out)

TPU-native form: one fused elementwise program — a shifted-OR for the
fire-neighbor mask plus two uniform fields for lightning/growth.  The
reference's sequential per-cell draw order is *not* reproducible on parallel
hardware; per-cell draws are i.i.d. here, which matches the rule's intended
distribution (the reference update reads only the OLD grid, so cell order
never affects the transition law).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gymca_tpu.core.operator import Operator
from gymca_tpu.core.spaces import BoxSpec
from gymca_tpu.ops.stencil import moore_shifts

__all__ = ["ForestFire", "drossel_step"]


def drossel_step(grid, p_fire, p_tree, key, *, empty: int, tree: int, fire: int):
    """One Drossel–Schwabl update. Pure; (..., H, W) int grid in, same out."""
    k_strike, k_grow = jax.random.split(key)

    fire_neighbor = jnp.zeros(grid.shape, dtype=bool)
    for _, view in moore_shifts(grid, empty):
        fire_neighbor = fire_neighbor | (view == fire)

    u_strike = jax.random.uniform(k_strike, grid.shape, dtype=jnp.float32)
    u_grow = jax.random.uniform(k_grow, grid.shape, dtype=jnp.float32)

    is_tree = grid == tree
    is_empty = grid == empty
    is_fire = grid == fire

    new_grid = jnp.where(
        is_tree & fire_neighbor,
        fire,
        jnp.where(
            is_tree & (u_strike < p_fire),
            fire,
            jnp.where(
                is_empty & (u_grow < p_tree),
                tree,
                jnp.where(is_fire, empty, grid),
            ),
        ),
    ).astype(grid.dtype)
    return new_grid


class ForestFire(Operator):
    """Operator wrapper over :func:`drossel_step`.

    Context = ``(p_fire, p_tree)`` as in the reference (ca_DrosselSchwabl.py:35).
    """

    grid_dependant = True
    action_dependant = False
    context_dependant = True
    deterministic = False

    def __init__(self, empty, tree, fire, **kwargs):
        super().__init__(**kwargs)
        self.empty, self.tree, self.fire = empty, tree, fire
        if self.context_spec is None:
            self.context_spec = BoxSpec(0.0, 1.0, shape=(2,))

    def update(self, grid, action, context, key=None):
        p_fire, p_tree = context[0], context[1]
        new_grid = drossel_step(
            grid, p_fire, p_tree, key,
            empty=self.empty, tree=self.tree, fire=self.fire,
        )
        return new_grid, context
