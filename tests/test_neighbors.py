"""moore_n / neighborhood_at vs an independent enclosing-grid oracle
(reference test pattern, utils/tests/test_neighbors.py:32-175)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymca_tpu.utils.neighbors import moore_n, neighborhood_at


def oracle_moore_n(n, pos, grid, invariant):
    """Enclosing-grid construction: embed grid in a larger invariant-filled
    canvas, then plain-slice."""
    g = np.asarray(grid)
    big = np.full((g.shape[0] + 2 * n, g.shape[1] + 2 * n), invariant, g.dtype)
    big[n:-n or None, n:-n or None] = g
    r, c = int(pos[0]), int(pos[1])
    return big[r : r + 2 * n + 1, c : c + 2 * n + 1]


@pytest.mark.parametrize("n", [1, 2, 3])
def test_moore_n_matches_oracle(key, n):
    grid = jax.random.randint(key, (7, 9), 0, 5)
    for pos in [(0, 0), (0, 8), (6, 0), (6, 8), (3, 4), (1, 7)]:
        got = moore_n(n, pos, grid, invariant=-1)
        np.testing.assert_array_equal(
            np.asarray(got), oracle_moore_n(n, pos, grid, -1), err_msg=str(pos)
        )


def test_moore_n_jit(key):
    grid = jax.random.randint(key, (8, 8), 0, 3)
    f = jax.jit(lambda p: moore_n(1, p, grid, 0))
    got = f(jnp.asarray([0, 7]))
    np.testing.assert_array_equal(np.asarray(got), oracle_moore_n(1, (0, 7), grid, 0))


def test_neighborhood_at(key):
    grid = jnp.arange(12).reshape(3, 4)
    nb = neighborhood_at(grid, (1, 1), invariant=-1)
    assert int(nb.self_) == 5
    assert int(nb.up_left) == 0 and int(nb.down_right) == 10
    nb = neighborhood_at(grid, (0, 0), invariant=-1)
    assert int(nb.up_left) == -1 and int(nb.self_) == 0 and int(nb.right) == 1


@pytest.mark.slow
def test_registered_envs_long_episodes():
    """Counterpart of the reference's slow registration test
    (tests/test_registration.py:29-81).  Default scale is CI-friendly;
    ``GYMCA_SLOW_SCALE=8`` reproduces the reference's 32-reset x 4096-step
    weight."""
    import os

    import gymnasium as gym
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib.figure import Figure

    import gymca_tpu

    scale = int(os.environ.get("GYMCA_SLOW_SCALE", "1"))
    for env_id in gymca_tpu.gymca.envs:
        env = gym.make(env_id).unwrapped
        env.reset(seed=0)
        for reset in range(4 * scale):
            env.reset()
            for step in range(256 * min(scale * 2, 16)):
                _, _, done, _, _ = env.step(env.action_space.sample())
                if done:
                    break
        fig = env.render()
        assert isinstance(fig, Figure)
        matplotlib.pyplot.close(fig)


@pytest.mark.slow
def test_batched_bulldozer_long_episodes():
    """Batched analog of the slow registration test: many envs, full
    episodes to termination through the fused batched path."""
    import jax
    import jax.numpy as jnp

    from gymca_tpu.envs.bulldozer import BulldozerCore

    core = BulldozerCore(32, 128)  # int8 default, fused-kernel eligible
    keys = jax.random.split(jax.random.key(3), 16)
    states = jax.vmap(core.initial_state)(keys)

    @jax.jit
    def run(states, key):
        def body(carry, k):
            st = carry
            a = jnp.stack(
                [jax.random.randint(k, (16,), 0, 9),
                 jax.random.randint(jax.random.fold_in(k, 1), (16,), 0, 2)],
                axis=-1,
            )
            st, out = core.step_batched(st, a, interpret=True)
            return st, out.reward
        return jax.lax.scan(body, states, jax.random.split(key, 512))

    states, rewards = run(states, jax.random.key(9))
    import numpy as np

    r = np.asarray(rewards)
    assert np.all((r <= 0.0) & (r >= -1.0))
    assert np.asarray(states.done).any(), "some 32x128 episodes should finish"
