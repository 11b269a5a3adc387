"""The Operator algebra — pure-functional core of gymca_tpu.

The central design idea inherited from the reference (``operator.py:10-75``,
``docs/architecture.md``): *an environment is a composition of Operators*.
Every Operator is a grid transform

    ``update(grid, action, context, key) -> (new_grid, new_context)``

with declared metadata (``grid_dependant``, ``action_dependant``,
``context_dependant``, ``deterministic``, ``suboperators``) and optional
space specs.

TPU-first redesign vs the reference:

* **Pure**: randomness comes from an explicit ``jax.random`` key argument —
  never from hidden per-operator RNG state (reference ``operator.py:72-75``
  seeds a private ``np.random.default_rng``).  Deterministic operators ignore
  the key (it may be ``None``).
* **One stack**: the same Operator serves the single-env debug path and the
  vmapped / mesh-sharded production path (the reference keeps parallel NumPy
  and JAX stacks, §SURVEY 1).
* Operator objects carry only *static* configuration (python numbers, tuples,
  small constant arrays such as stencil kernels), so they can be closed over
  by ``jax.jit`` as compile-time constants.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax

from gymca_tpu.core.spaces import Spec

__all__ = ["Operator", "Identity", "Sequence"]


class Operator:
    """Abstract pure grid transform."""

    # Set these in ALL subclasses (same contract as reference operator.py:12-18)
    suboperators: Tuple["Operator", ...] = tuple()

    grid_dependant: Optional[bool] = None
    action_dependant: Optional[bool] = None
    context_dependant: Optional[bool] = None

    deterministic: Optional[bool] = None

    def __init__(
        self,
        grid_spec: Optional[Spec] = None,
        action_spec: Optional[Spec] = None,
        context_spec: Optional[Spec] = None,
    ) -> None:
        self.grid_spec = grid_spec
        self.action_spec = action_spec
        self.context_spec = context_spec

    def update(self, grid, action, context, key=None):
        """Update a CA lattice using an action, a context and a PRNG key.

        Returns ``(new_grid, new_context)``.  Must be pure (jit/vmap-safe).
        """
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.update(*args, **kwargs)

    # --- introspection helpers -------------------------------------------

    def tree_flatten_ops(self):
        """Yield self and all suboperators, depth-first."""
        yield self
        for sub in self.suboperators:
            yield from sub.tree_flatten_ops()


class Identity(Operator):
    """Minimal no-op Operator (reference ``tests/identity.py:4-28``)."""

    grid_dependant = True
    action_dependant = False
    context_dependant = False
    deterministic = True

    def update(self, grid, action, context, key=None):
        return grid, context


class Sequence(Operator):
    """Compose operators left-to-right over (grid, context) with a split key."""

    grid_dependant = True
    action_dependant = True
    context_dependant = True

    def __init__(self, operators: Tuple[Operator, ...], **kwargs):
        super().__init__(**kwargs)
        self.suboperators = tuple(operators)
        self.deterministic = all(op.deterministic for op in operators)

    def update(self, grid, action, context, key=None):
        keys = (
            jax.random.split(key, len(self.suboperators))
            if key is not None
            else [None] * len(self.suboperators)
        )
        for op, k in zip(self.suboperators, keys):
            grid, context = op(grid, action, context, k)
        return grid, context
