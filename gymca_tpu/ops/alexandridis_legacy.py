"""Legacy SEQUENTIAL Alexandridis prototype (debug / behavioral spec only).

Behavioral counterpart of the reference's dead-prototype operator
``forest_fire/operators/ca_alexandridis.py:135-221`` — the per-cell,
order-dependent NumPy update that ``PartiallyObservableForestFireJax``
(our ``AlexandridisCA``) superseded.  The reference itself treats it as
abandoned (it shadows numpy with jax.numpy on line 1 and is not wired into
any env), but it defines the SEQUENTIAL-update semantics the vectorized CA
deliberately diverges from, so it is kept here as an executable spec:

* cells update in row-major order against the OLD grid for neighborhoods but
  the NEW grid for writes (``ca_alexandridis.py:147-149``);
* pinecone landings ignite cells immediately and add them to
  ``skipped_indices`` so later iterations of the SAME pass skip them
  (``ca_alexandridis.py:152-154, 203-210``) — an order dependence a
  vectorized update can only approximate (SURVEY.md §7 "hard parts" #3);
* the legacy veg/den probability tables differ from the Jax stack's
  (``ca_alexandridis.py:92-93`` vs ``ca_alexandridis_jax.py:169-206``), and
  the per-cell slope is a scalar, not a 3x3 stencil;
* fire ages are sampled in [4, 10] (``ca_alexandridis.py:111``), not the
  grid-scaled range the Jax stack uses.

This is intentionally NumPy + stateful RNG (single env, host-side): it is a
parity oracle and documentation artifact, NOT a TPU execution path.  Use
``AlexandridisCA`` (XLA) or ``pallas_alexandridis`` (fused kernel) for real
work; construct this one via ``SequentialAlexandridisCA`` or
``AlexandridisCA``'s ``sequential=True`` debug factory.
"""

from __future__ import annotations

import numpy as np

__all__ = ["SequentialAlexandridisCA"]

# Legacy lookup tables (reference ca_alexandridis.py:92-93, 122-123).
_VEG_BURN = {1: -0.3, 2: 0.0, 3: 0.3, 4: 0.6, 5: 1.0}
_DEN_BURN = {1: -0.4, 2: 0.0, 3: 0.3, 4: 0.6, 5: 1.0}
_VEG_PINE = {1: 0.0, 2: 0.8, 3: 1.6, 4: 2.0, 5: 2.5}
_DEN_PINE = {1: 0.0, 2: 0.6, 3: 1.2, 4: 1.5, 5: 2.0}
_P_H = 0.58
_SLOPE_COEFF = 0.078

# Pinecone direction lookups (reference ca_alexandridis.py:49-66).
_LOOKUP_GRID = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)]
_DX = [1, 1, 0, -1, -1, -1, 0, 1]
_DY = [0, 1, 1, 1, 0, -1, -1, -1]


class SequentialAlexandridisCA:
    """Sequential per-cell Alexandridis fire CA (legacy prototype).

    ``update(grid, context)`` mutates nothing; returns
    ``(new_grid, context)`` with ``context['fire_age']`` and
    ``context['wind_index']`` advanced, matching the reference's in-place
    behavior functionally.

    Divergence note: this operator's results CANNOT be reproduced by the
    vectorized ``AlexandridisCA`` even under matched RNG — the sequential
    ``skipped_indices`` pinecone semantics make cell updates order-dependent
    (and the reference's own Jax port accepts that divergence; its pinecone
    path is commented out of the main update,
    ``ca_alexandridis_jax.py:400-420``).
    """

    def __init__(self, empty: int = 0, tree: int = 1, fire: int = 2,
                 rng: np.random.Generator | None = None):
        self.empty, self.tree, self.fire = empty, tree, fire
        self.rng = rng if rng is not None else np.random.default_rng()

    # -- per-cell rules -------------------------------------------------------

    def _neighborhood(self, grid, row, col):
        """3x3 neighborhood with out-of-bounds cells as ``empty``
        (reference neighborhood_at semantics, neighbors.py:152-184)."""
        h, w = grid.shape
        out = np.full((3, 3), self.empty, grid.dtype)
        r0, r1 = max(0, row - 1), min(h, row + 2)
        c0, c1 = max(0, col - 1), min(w, col + 2)
        out[r0 - row + 1:r1 - row + 1, c0 - col + 1:c1 - col + 1] = (
            grid[r0:r1, c0:c1]
        )
        return out

    def _try_ignite(self, nb, row, col, new_grid, wind, ctx, fire_age):
        """Tree with a fire neighbor: burn iff some on-fire neighbor's
        directional probability wins its uniform roll
        (reference _set_fire, ca_alexandridis.py:71-111)."""
        p_veg = _VEG_BURN[int(ctx["vegetation"][row, col])]
        p_den = _DEN_BURN[int(ctx["density"][row, col])]
        slope = float(np.asarray(ctx["slope"])[row, col])
        p_burn = _P_H * (1 + p_veg) * (1 + p_den) * wind * np.exp(
            _SLOPE_COEFF * slope
        )
        roll = self.rng.uniform(0.0, 1.0, p_burn.shape)
        if np.any((nb == self.fire) & (p_burn > roll)):
            new_grid[row, col] = self.fire
            fire_age[row, col] = self.rng.integers(4, 11)

    def _try_pinecone_ignite(self, row, col, new_grid, ctx, fire_age) -> bool:
        """Pinecone landing (reference _set_fire_pinecone,
        ca_alexandridis.py:113-133): wind/slope-free burn check with the
        boosted veg/den tables."""
        p_veg = _VEG_PINE[int(ctx["vegetation"][row, col])]
        p_den = _DEN_PINE[int(ctx["density"][row, col])]
        p_burn = _P_H * (1 + p_veg) * (1 + p_den)
        if p_burn > self.rng.uniform(0.0, 1.0):
            new_grid[row, col] = self.fire
            fire_age[row, col] = self.rng.integers(4, 11)
            return True
        return False

    # -- full pass ------------------------------------------------------------

    def update(self, grid, context):
        grid = np.asarray(grid)
        h, w = grid.shape
        ctx = dict(context)
        wind, ft = ctx["winds"][ctx["wind_index"]]
        wind = np.asarray(wind)
        ft = np.asarray(ft)
        new_grid = grid.copy()
        fire_age = np.asarray(ctx["fire_age"]).copy()
        p_tree = float(ctx["p_tree"])
        skipped: set = set()

        for row in range(h):
            for col in range(w):
                if (row, col) in skipped:
                    continue
                cell = grid[row, col]
                if cell == self.tree:
                    nb = self._neighborhood(grid, row, col)
                    if np.any(nb == self.fire):
                        self._try_ignite(
                            nb, row, col, new_grid, wind, ctx, fire_age
                        )
                elif cell == self.empty:
                    if self.rng.choice([True, False], p=[p_tree, 1 - p_tree]):
                        new_grid[row, col] = self.tree
                elif cell == self.fire:
                    fire_age[row, col] -= 1
                    if fire_age[row, col] == 0:
                        new_grid[row, col] = self.empty
                    # Pinecone spotting (ca_alexandridis.py:184-210): Poisson
                    # count, uniform direction, thrust 3*N(0,1)*ft[direction].
                    n_pine = int(self.rng.poisson())
                    if n_pine == 0:
                        continue
                    dirs = self.rng.integers(0, 8, size=n_pine)
                    thrust = 3.0 * self.rng.standard_normal(n_pine)
                    for i, d in enumerate(dirs):
                        t = thrust[i] * float(ft[_LOOKUP_GRID[d]])
                        nr = round(row + _DX[d] * t)
                        nc = round(col + _DY[d] * t)
                        if (0 <= nr < h and 0 <= nc < w
                                and (nr, nc) != (row, col)):
                            if self._try_pinecone_ignite(
                                nr, nc, new_grid, ctx, fire_age
                            ):
                                skipped.add((nr, nc))

        # Stochastic wind rotation (ca_alexandridis.py:212-220).
        p_wc = float(ctx["p_wind_change"])
        if self.rng.choice([True, False], p=[p_wc, 1 - p_wc]):
            step = int(self.rng.integers(1, 8))
            ctx["wind_index"] = (ctx["wind_index"] + step) % len(ctx["winds"])
        ctx["fire_age"] = fire_age
        return new_grid, ctx
