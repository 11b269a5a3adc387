"""RepeatCA time-semantics tests (reference operators/tests/test_repeat_ca.py)."""

import jax
import jax.numpy as jnp

from gymca_tpu.core.operator import Operator
from gymca_tpu.ops.repeat_ca import RepeatCA


class CountingCA(Operator):
    """Deterministic CA that increments every cell by 1."""

    grid_dependant = True
    action_dependant = False
    context_dependant = True
    deterministic = True

    def update(self, grid, action, context, key=None):
        return grid + 1, context


def make_repeater(t_per_action, mode="modf", max_repeats=4):
    return RepeatCA(
        CountingCA(),
        t_acting=lambda a: jnp.asarray(t_per_action, jnp.float32),
        t_perception=lambda s: jnp.asarray(0.0, jnp.float32),
        max_repeats=max_repeats,
        mode=mode,
    )


class TestModfSemantics:
    def test_exact_repeats_and_frac_reset(self, key):
        rep = make_repeater(1.5)
        grid = jnp.zeros((4, 4), jnp.int32)
        # accu 0.5 + 1.5 = 2.0 -> 2 repeats, frac 0.0
        new_grid, (params, accu) = rep(grid, None, (None, jnp.asarray(0.5)), key)
        assert bool(jnp.all(new_grid == 2))
        assert float(accu) == 0.0

    def test_zero_repeats(self, key):
        rep = make_repeater(0.25)
        grid = jnp.zeros((4, 4), jnp.int32)
        new_grid, (_, accu) = rep(grid, None, (None, jnp.asarray(0.25)), key)
        assert bool(jnp.all(new_grid == 0))
        assert abs(float(accu) - 0.5) < 1e-6

    def test_fraction_carries(self, key):
        rep = make_repeater(1.3)
        grid = jnp.zeros((2, 2), jnp.int32)
        new_grid, (_, accu) = rep(grid, None, (None, jnp.asarray(0.0)), key)
        assert bool(jnp.all(new_grid == 1))
        assert abs(float(accu) - 0.3) < 1e-5

    def test_jittable(self, key):
        rep = make_repeater(1.5)

        @jax.jit
        def run(grid, accu, key):
            return rep(grid, None, (None, accu), key)

        new_grid, (_, accu) = run(jnp.zeros((4, 4), jnp.int32), jnp.asarray(2.5), key)
        assert bool(jnp.all(new_grid == 4))  # 2.5 + 1.5 = 4 repeats


class TestSingleSemantics:
    def test_always_one_step(self, key):
        """Reference JAX-stack behavior (repeat_ca_jax.py:61-69)."""
        rep = make_repeater(5.0, mode="single")
        grid = jnp.zeros((4, 4), jnp.int32)
        new_grid, (_, accu) = rep(grid, None, (None, jnp.asarray(0.0)), key)
        assert bool(jnp.all(new_grid == 1))
        assert float(accu) == 0.0  # frac of 5.0
