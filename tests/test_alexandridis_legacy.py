"""Rule-table tests for the legacy SEQUENTIAL Alexandridis prototype
(reference ca_alexandridis.py:135-221 semantics; see
gymca_tpu/ops/alexandridis_legacy.py for the divergence note)."""

import numpy as np
import pytest

from gymca_tpu.ops.alexandridis import AlexandridisCA
from gymca_tpu.ops.alexandridis_legacy import SequentialAlexandridisCA

EMPTY, TREE, FIRE = 0, 1, 2
H = W = 8


def make_context(
    p_tree=0.0, p_wind_change=0.0, veg=5, den=5, slope=0.0, fire_age=None
):
    wind = np.ones((3, 3))
    wind[1, 1] = 0.0
    ft = np.zeros((3, 3))  # zero thrust => pinecones never travel
    return {
        "winds": [(wind, ft)] * 8,
        "wind_index": 0,
        "density": np.full((H, W), den, np.int32),
        "vegetation": np.full((H, W), veg, np.int32),
        "slope": np.full((H, W), slope),
        "altitude": np.zeros((H, W)),
        "fire_age": np.zeros((H, W), np.int64) if fire_age is None else fire_age,
        "p_tree": p_tree,
        "p_wind_change": p_wind_change,
    }


def test_factory():
    op = AlexandridisCA.sequential_prototype(EMPTY, TREE, FIRE)
    assert isinstance(op, SequentialAlexandridisCA)


def test_tree_with_fire_neighbor_ignites_at_max_terrain():
    """veg=den=5, flat slope, wind=1 everywhere: p_burn = .58*2*2 = 2.32 > 1,
    so every tree adjacent to fire must ignite with fire_age in [4, 10]."""
    op = SequentialAlexandridisCA(EMPTY, TREE, FIRE, rng=np.random.default_rng(3))
    grid = np.full((H, W), TREE, np.int64)
    grid[4, 4] = FIRE
    fa = np.zeros((H, W), np.int64)
    fa[4, 4] = 5
    ctx = make_context(fire_age=fa)
    new, ctx2 = op.update(grid, ctx)
    for r in range(3, 6):
        for c in range(3, 6):
            if (r, c) != (4, 4):
                assert new[r, c] == FIRE, (r, c)
                assert 4 <= ctx2["fire_age"][r, c] <= 10
    # cells two away from the fire stay trees
    assert new[1, 1] == TREE and new[6, 7] == TREE


def test_tree_never_ignites_at_hostile_terrain():
    """veg=den=1: p_burn = .58*0.7*0.6 ≈ 0.24 scaled by wind 0 => never."""
    op = SequentialAlexandridisCA(EMPTY, TREE, FIRE, rng=np.random.default_rng(5))
    grid = np.full((H, W), TREE, np.int64)
    grid[4, 4] = FIRE
    fa = np.zeros((H, W), np.int64)
    fa[4, 4] = 9
    ctx = make_context(veg=1, den=1, fire_age=fa)
    ctx["winds"] = [(np.zeros((3, 3)), np.zeros((3, 3)))] * 8
    new, _ = op.update(grid, ctx)
    assert (new == FIRE).sum() == 1  # only the original fire


def test_fire_burns_out_when_age_expires():
    op = SequentialAlexandridisCA(EMPTY, TREE, FIRE, rng=np.random.default_rng(0))
    grid = np.full((H, W), EMPTY, np.int64)
    grid[2, 2] = FIRE
    grid[5, 5] = FIRE
    fa = np.zeros((H, W), np.int64)
    fa[2, 2] = 1  # expires this step
    fa[5, 5] = 3  # keeps burning
    new, ctx2 = op.update(grid, make_context(fire_age=fa))
    assert new[2, 2] == EMPTY
    assert new[5, 5] == FIRE
    assert ctx2["fire_age"][5, 5] == 2


def test_empty_growth_probability_extremes():
    op = SequentialAlexandridisCA(EMPTY, TREE, FIRE, rng=np.random.default_rng(1))
    grid = np.full((H, W), EMPTY, np.int64)
    new, _ = op.update(grid, make_context(p_tree=1.0))
    assert (new == TREE).all()
    new, _ = op.update(grid, make_context(p_tree=0.0))
    assert (new == EMPTY).all()


def test_wind_rotation():
    op = SequentialAlexandridisCA(EMPTY, TREE, FIRE, rng=np.random.default_rng(2))
    grid = np.full((H, W), EMPTY, np.int64)
    ctx = make_context(p_wind_change=1.0)
    _, ctx2 = op.update(grid, ctx)
    assert ctx2["wind_index"] != 0  # step sampled from [1, 7]
    _, ctx3 = op.update(grid, make_context(p_wind_change=0.0))
    assert ctx3["wind_index"] == 0


def test_pinecone_spotting_and_skip_semantics():
    """With max thrust tables and a seeded RNG, fires eventually spot
    pinecones onto distant cells; a spotted cell is skipped for the rest of
    the pass (it keeps its sampled fire_age — it is not double-processed)."""
    rng = np.random.default_rng(11)
    op = SequentialAlexandridisCA(EMPTY, TREE, FIRE, rng=rng)
    grid = np.full((H, W), TREE, np.int64)
    grid[0, 0] = FIRE
    fa = np.zeros((H, W), np.int64)
    fa[0, 0] = 50
    ctx = make_context(veg=5, den=5, fire_age=fa)
    ft = np.full((3, 3), 2.0)  # strong thrust in every direction
    ctx["winds"] = [(np.zeros((3, 3)), ft)] * 8  # wind 0: no contact spread
    spotted = False
    for _ in range(40):
        grid, ctx = op.update(grid, ctx)
        fires = np.argwhere(grid == FIRE)
        # contact spread is disabled (wind 0), so any fire beyond the
        # original cell must have arrived by pinecone
        if any((abs(r) + abs(c)) > 2 for r, c in fires):
            spotted = True
            break
    assert spotted, "pinecones never spotted within 40 steps"
    # every burning cell carries a live age sampled in [4, 10] at ignition
    ages = ctx["fire_age"][grid == FIRE]
    assert (ages >= 1).all()
