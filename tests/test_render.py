"""Rendering returns matplotlib Figures (reference test pattern:
``tests/test_registration.py`` asserts render() -> Figure periodically)."""

import matplotlib

matplotlib.use("Agg")

import jax
import numpy as np
import pytest
from matplotlib.figure import Figure

from gymca_tpu.envs.advanced import AdvancedForestFireBulldozerEnv
from gymca_tpu.envs.bulldozer import ForestFireBulldozerEnv
from gymca_tpu.envs.helicopter import ForestFireHelicopterEnv
from gymca_tpu.utils.render import figure_to_rgb, local_window, plot_grid_attribute


def test_helicopter_render():
    env = ForestFireHelicopterEnv(8, 8, seed=1)
    env.reset(seed=1)
    fig = env.render()
    assert isinstance(fig, Figure)
    rgb = figure_to_rgb(fig)
    assert rgb.ndim == 3 and rgb.shape[2] == 3 and rgb.dtype == np.uint8
    matplotlib.pyplot.close(fig)


def test_bulldozer_render():
    env = ForestFireBulldozerEnv(16, 16, seed=2)
    env.reset(seed=2)
    env.step(env.action_space.sample())
    fig = env.render()
    assert isinstance(fig, Figure)
    matplotlib.pyplot.close(fig)


def test_advanced_render_and_attributes():
    env = AdvancedForestFireBulldozerEnv(
        16, 16, key=jax.random.key(0), num_envs=2
    )
    obs, info = env.reset()
    fig = env.render(obs, info, env_idx=1)
    assert isinstance(fig, Figure)
    matplotlib.pyplot.close(fig)

    for figs in (env.altitude_render(), env.density_render(),
                 env.vegitation_render()):
        assert len(figs) == 2
        assert all(isinstance(f, Figure) for f in figs)
        for f in figs:
            matplotlib.pyplot.close(f)


def test_local_window():
    g = np.arange(25).reshape(5, 5)
    w = local_window(g, (0, 0), 1, fill=-1)
    assert w.shape == (3, 3)
    assert w[0, 0] == -1 and w[1, 1] == 0 and w[2, 2] == 6
    w = local_window(g, (4, 4), 2, fill=-1)
    assert w.shape == (5, 5)
    assert w[0, 0] == 12 and w[2, 2] == 24 and w[4, 4] == -1


def test_plot_grid_attribute_constant_grid():
    fig = plot_grid_attribute(np.zeros((4, 4)), "Altitude")
    assert isinstance(fig, Figure)
    matplotlib.pyplot.close(fig)
