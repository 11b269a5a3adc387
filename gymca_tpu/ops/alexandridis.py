"""Alexandridis-et-al.-2008 wildfire CA with hidden terrain — the production
physics of the Advanced Bulldozer environment.

Behavioral counterpart of reference ``operators/ca_alexandridis_jax.py``:

* burn probability  ``p = (heat - dousing) * (1+p_veg) * (1+p_den) * wind *
  exp(0.078 * slope)`` with vegetation/density lookup tables
  ``[-999,-0.1,0.2,0.5,0.8,1.2]`` / ``[-999,-0.2,0.2,0.5,0.8,1.2]``
  (``ca_alexandridis_jax.py:164-206``);
* ``heat`` = ring-decayed kernel of radius ``ceil(log2(N))-2`` over the fire
  mask (``build_burn_kernel``, ``:108-153``);
* dousing retardant = 5x5 weighted sum over ``dousing_count`` subtracted from
  heat (``:64-105, 341-346``);
* fire ages sampled in ``[1.5, 1.75] * (N + N/2)`` for new fires; fires burn
  out at age <= 1 (``:59-61, 366-392``);
* stochastic wind-index rotation with prob ``p_wind_change`` (``:443-451``);
* optional pinecone spotting (vectorized; reference has it commented out of
  the main path, ``:400-420`` — default OFF here for parity).

TPU-native: the reference builds per-cell neighborhoods with a double-vmapped
``lax.dynamic_slice`` over every cell (``:332-343``) — O(H*W) gathers.  Here
the radius-1 ignition test is 8 shifted whole-grid masks and the heat /
dousing fields are single ``lax.conv`` calls, which XLA maps onto the conv
units directly.  Distributional semantics are identical (i.i.d. per-cell
per-neighbor uniforms).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gymca_tpu.config import TYPE_BOX, TYPE_INT
from gymca_tpu.core.operator import Operator
from gymca_tpu.ops.stencil import (
    NEIGHBOR_OFFSETS,
    correlate2d,
    multi_box_sums,
    ring_kernel_filter,
    shift,
)

__all__ = ["AlexandridisCA", "build_burn_kernel", "burn_kernel_layer_weights",
           "build_dousing_weights", "VEG_PROBS", "DEN_PROBS", "SLOPE_COEFF"]

# Vegetation / density factor lookup tables; index 0 is a -999 sentinel
# (ca_alexandridis_jax.py:169-173).
VEG_PROBS = jnp.asarray([-999.0, -0.1, 0.2, 0.5, 0.8, 1.2], TYPE_BOX)
DEN_PROBS = jnp.asarray([-999.0, -0.2, 0.2, 0.5, 0.8, 1.2], TYPE_BOX)
SLOPE_COEFF = 0.078  # 'a' in exp(a * slope)


def burn_kernel_layer_weights(burn_kernel_radius: int) -> list:
    """Per-ring weights of the heat kernel (ca_alexandridis_jax.py:108-153).

    Total weight 0.065; each ring takes 60% of the remaining weight spread
    over its cells (the innermost ring also covers the center), the last ring
    takes everything left.
    """
    total_weight = 0.065
    num_layers = burn_kernel_radius
    layer_weights = []
    remaining = total_weight
    for i in range(num_layers):
        size_outer = (i * 2 + 3) ** 2
        inner_area = (i * 2 + 1) ** 2
        cells = size_outer - inner_area
        if i == 0:
            cells += 1  # center shares the innermost ring weight
        if i == num_layers - 1:
            layer_weights.append(remaining / cells)
        else:
            layer_weights.append(remaining * 0.60 / cells)
            remaining *= 0.40
    return layer_weights


def build_burn_kernel(burn_kernel_radius: int) -> jnp.ndarray:
    """Dense (2r+1)^2 heat kernel — reference form, used for differential
    testing of the ring/box fast path."""
    layer_weights = burn_kernel_layer_weights(burn_kernel_radius)
    num_layers = burn_kernel_radius
    size = 2 * burn_kernel_radius + 1
    k = jnp.zeros((size, size), TYPE_BOX)
    center = burn_kernel_radius
    k = k.at[center, center].set(layer_weights[0])
    for i in range(num_layers):
        w = layer_weights[i]
        ring = i + 1
        s, e = center - ring, center + ring + 1
        k = k.at[s:e, s].set(w)
        k = k.at[s:e, e - 1].set(w)
        k = k.at[s, s:e].set(w)
        k = k.at[e - 1, s:e].set(w)
    return k


def build_dousing_weights(fire_age_max: float) -> jnp.ndarray:
    """5x5 retardant kernel: border/inner weights scaled by the max fire age
    (ca_alexandridis_jax.py:64-105)."""
    border = 0.0007 * fire_age_max * 0.50
    inner = 0.006 * fire_age_max * 0.50
    k = jnp.full((5, 5), border, TYPE_BOX)
    k = k.at[1:4, 1:4].set(inner)
    return k


class AlexandridisCA(Operator):
    """Partially-observable wildfire CA over hidden terrain.

    ``update(grid, action, (per_env_context, shared_context), key)`` ->
    ``(new_grid, (new_per_env_context, shared_context))`` for ONE env;
    callers vmap over the env axis.
    """

    grid_dependant = True
    action_dependant = False
    context_dependant = True
    deterministic = False

    def __init__(
        self,
        grid_size: int,
        empty: int = 0,
        tree: int = 1,
        fire: int = 2,
        enable_pinecones: bool = False,
        max_pinecones: int = 5,
        static_p_tree: float = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.grid_size = grid_size
        self.empty, self.tree, self.fire = empty, tree, fire
        self.enable_pinecones = enable_pinecones
        self.max_pinecones = max_pinecones
        # When the env's p_tree is statically known to be 0 (the Advanced
        # default), empty cells can never grow — skip the growth uniforms and
        # branch entirely.
        self.skip_growth = static_p_tree == 0.0

        # Fire lifetime model (ca_alexandridis_jax.py:58-61): in the time it
        # takes to go halfway across and most of the way down, the fire
        # builds up.
        self.initial_spread_time = grid_size + grid_size // 2
        self.fire_age_min = int(self.initial_spread_time * 1.5)
        self.fire_age_max = int(self.initial_spread_time * 1.75)
        self.burn_kernel_radius = max(math.ceil(math.log2(max(grid_size, 4))) - 2, 1)

        self.burn_kernel = build_burn_kernel(self.burn_kernel_radius)
        self.burn_layer_weights = burn_kernel_layer_weights(self.burn_kernel_radius)
        self.dousing_weights = build_dousing_weights(self.fire_age_max)
        # two-level 5x5 dousing kernel as box sums: border*box_2 +
        # (inner-border)*box_1
        self._dousing_border = 0.0007 * self.fire_age_max * 0.50
        self._dousing_inner = 0.006 * self.fire_age_max * 0.50

    @staticmethod
    def sequential_prototype(empty: int = 0, tree: int = 1, fire: int = 2,
                             rng=None):
        """Debug factory for the LEGACY sequential per-cell prototype
        (reference ca_alexandridis.py:135-221) — NumPy, single-env,
        order-dependent pinecone semantics.  See
        ``gymca_tpu.ops.alexandridis_legacy`` for the divergence note; this
        is a behavioral spec / oracle, not a TPU path."""
        from gymca_tpu.ops.alexandridis_legacy import SequentialAlexandridisCA

        return SequentialAlexandridisCA(empty, tree, fire, rng=rng)

    # --- pieces ------------------------------------------------------------

    def _ignitions(self, grid, base, wind_matrix, exp_slope, key):
        """Tree cells ignited by any fire neighbor passing its directional
        burn test.  8 shifted masks; per-cell per-direction i.i.d. uniforms.

        ``exp_slope``: (3, 3, H, W) precomputed ``exp(0.078 * slope)`` —
        slope is static terrain, so the transcendental is hoisted out of the
        step entirely (8 full-grid exp passes per step in the naive form),
        and the direction-major layout makes each ``exp_slope[i, j]`` slice
        contiguous instead of a stride-9 gather from (H, W, 3, 3).
        """
        h, w = grid.shape
        # Ignition = OR of 8 independent per-direction Bernoullis.  Sampling
        # one uniform against the complement product 1 - prod(1 - p_d) is
        # distributionally identical and needs 1 uniform/cell instead of 8
        # (threefry is a real cost at num_envs x H x W x 8).  Clamping each
        # factor at 0 preserves the "p >= 1 means certain" semantics.
        u = jax.random.uniform(key, (h, w), dtype=TYPE_BOX)
        no_ignite = jnp.ones((h, w), TYPE_BOX)
        for dr, dc in NEIGHBOR_OFFSETS:
            fire_there = shift(grid, dr, dc, self.empty) == self.fire
            p = base * wind_matrix[1 + dr, 1 + dc] * exp_slope[1 + dr, 1 + dc]
            no_ignite = no_ignite * jnp.maximum(
                1.0 - jnp.where(fire_there, p, 0.0), 0.0
            )
        return u < 1.0 - no_ignite

    @staticmethod
    def precompute_exp_slope(slope: jnp.ndarray) -> jnp.ndarray:
        """(..., H, W, 3, 3) slope tensor -> (..., 3, 3, H, W) exp factor.

        Stored bf16: it is a static multiplicative factor ~O(1) feeding
        f32-accumulated probability products (<0.4% relative rounding), it
        is the largest per-env tensor (9 grid planes), and the fused kernel
        is DMA-bound — bf16 halves its stream.  Uniform terrain (slope 0 →
        factor 1.0) stays exact.
        """
        axes = tuple(range(slope.ndim - 4)) + tuple(
            slope.ndim - 4 + i for i in (2, 3, 0, 1)
        )
        return jnp.exp(SLOPE_COEFF * jnp.transpose(slope, axes)).astype(
            jnp.bfloat16
        )

    @staticmethod
    def precompute_veg_den_factor(vegetation, density) -> jnp.ndarray:
        """Static per-cell (1 + p_veg) * (1 + p_den) factor (terrain never
        changes after construction); bf16 for the same reasons as
        :meth:`precompute_exp_slope`."""
        p_veg = VEG_PROBS[jnp.clip(vegetation, 1, 5)]
        p_den = DEN_PROBS[jnp.clip(density, 1, 5)]
        return ((1.0 + p_veg) * (1.0 + p_den)).astype(jnp.bfloat16)

    def _pinecone_spread(self, grid, key, per_env, ft, fire_mask):
        """Pinecone spotting: every fire cell lofts up to ``max_pinecones``
        embers; each flies a wind-scaled normal-length flight along one of 8
        compass directions and ignites a tree where it lands.

        Distributional counterpart of the reference's dead-code spotting path
        (``ca_alexandridis_jax.py:230-319``), restructured slot-major: one
        (H, W) sample layer per ember slot instead of an (H, W, m) tensor, so
        each slot is a plain 2-D gather the compiler pipelines.  The d-th
        compass direction (counter-clockwise from East, in array coords
        ``(drow, dcol)``) draws its wind-thrust factor from the d-th
        off-center cell of the 3x3 ``ft`` matrix in row-major scan order — an
        arbitrary pairing the reference fixes; kept for parity.
        """
        h, w = grid.shape
        rows = jnp.arange(h)[:, None]
        cols = jnp.arange(w)[None, :]

        compass = jnp.asarray(
            ((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)),
            TYPE_INT,
        )
        thrust_factor = jnp.stack(
            [ft[1 + dr, 1 + dc] for dr, dc in NEIGHBOR_OFFSETS]
        ).astype(TYPE_BOX)
        burn_p = 0.48 * self.precompute_veg_den_factor(
            per_env["vegetation"], per_env["density"]
        )

        k_count, k_slots = jax.random.split(key)
        n_embers = jnp.minimum(
            jax.random.poisson(k_count, 1.0, (h, w)), self.max_pinecones
        )

        land_r, land_c, lit = [], [], []
        for slot in range(self.max_pinecones):
            k_dir, k_len, k_burn = jax.random.split(
                jax.random.fold_in(k_slots, slot), 3
            )
            d = jax.random.randint(k_dir, (h, w), 0, 8)
            flight = jax.random.normal(k_len, (h, w), TYPE_BOX) * thrust_factor[d]
            r = jnp.clip(jnp.round(rows + compass[d, 0] * flight), 0, h - 1
                         ).astype(TYPE_INT)
            c = jnp.clip(jnp.round(cols + compass[d, 1] * flight), 0, w - 1
                         ).astype(TYPE_INT)
            in_flight = fire_mask & (slot < n_embers)
            u = jax.random.uniform(k_burn, (h, w), dtype=TYPE_BOX)
            lit.append(
                in_flight & (grid[r, c] == self.tree) & (u < burn_p[r, c])
            )
            land_r.append(r)
            land_c.append(c)
        return (
            jnp.stack(land_r).reshape(-1),
            jnp.stack(land_c).reshape(-1),
            jnp.stack(lit).reshape(-1),
        )

    # --- main update ---------------------------------------------------------

    def update(self, grid, action, context, key=None):
        per_env, shared = context
        wind_matrix = shared["winds"][per_env["wind_index"]]
        ft = shared["fts"][per_env["wind_index"]]

        k_burn, k_grow, k_age, k_wchange, k_widx, k_pine = jax.random.split(key, 6)

        tree_mask = grid == self.tree
        fire_mask = grid == self.fire
        empty_mask = grid == self.empty

        # Ring/box integral-image filters instead of dense k x k convs: XLA
        # lowers single-channel large-kernel convs to O(k^2) sliding-window
        # VPU work (~100x slower measured); box sums are O(rings).
        heat = ring_kernel_filter(
            fire_mask.astype(TYPE_BOX), self.burn_layer_weights
        )
        dbox = multi_box_sums(per_env["dousing_count"].astype(TYPE_BOX), (1, 2))
        dousing_ret = (
            self._dousing_border * dbox[2]
            + (self._dousing_inner - self._dousing_border) * dbox[1]
        )
        vdf = per_env.get("veg_den_factor")
        if vdf is None:  # fallback for direct operator use
            vdf = self.precompute_veg_den_factor(
                per_env["vegetation"], per_env["density"]
            )
        base = (heat - dousing_ret) * vdf
        exp_slope = per_env.get("exp_slope")
        if exp_slope is None:  # fallback for direct operator use
            exp_slope = self.precompute_exp_slope(per_env["slope"])
        ignite = self._ignitions(grid, base, wind_matrix, exp_slope, k_burn)

        new_fire_ages = jax.random.randint(
            k_age, grid.shape, self.fire_age_min, self.fire_age_max
        ).astype(per_env["fire_age"].dtype)

        # Rule cascade (ca_alexandridis_jax.py:379-392).
        if self.skip_growth:
            grown = grid
        else:
            u_grow = jax.random.uniform(k_grow, grid.shape, dtype=TYPE_BOX)
            grown = jnp.where(
                empty_mask & (u_grow < shared["p_tree"]), self.tree, grid
            )
        new_grid = jnp.where(
            tree_mask & ignite,
            self.fire,
            jnp.where(
                fire_mask & (per_env["fire_age"] <= 1), self.empty, grown
            ),
        ).astype(grid.dtype)

        new_fire_age = jnp.where(
            (new_grid == self.fire) & (grid != self.fire),
            new_fire_ages,
            per_env["fire_age"],
        )

        if self.enable_pinecones:
            rows, cols, burn = self._pinecone_spread(
                new_grid, k_pine, per_env, ft, fire_mask
            )
            pinecone_ages = jax.random.randint(
                jax.random.fold_in(k_pine, 1), burn.shape, 4, 11
            ).astype(new_fire_age.dtype)
            new_grid = new_grid.at[rows, cols].set(
                jnp.where(burn, self.fire, new_grid[rows, cols])
            )
            new_fire_age = new_fire_age.at[rows, cols].set(
                jnp.where(burn, pinecone_ages, new_fire_age[rows, cols])
            )

        # Burning fires age (ca_alexandridis_jax.py:423).
        new_fire_age = jnp.where(fire_mask, new_fire_age - 1, new_fire_age)

        # Stochastic wind rotation (ca_alexandridis_jax.py:443-451).
        wind_change = jax.random.uniform(k_wchange) < shared["p_wind_change"]
        n_winds = shared["winds"].shape[0]
        new_wind_index = jnp.where(
            wind_change,
            (per_env["wind_index"] + jax.random.randint(k_widx, (), 1, 8)) % n_winds,
            per_env["wind_index"],
        )

        new_per_env = dict(per_env)
        new_per_env["fire_age"] = new_fire_age
        new_per_env["wind_index"] = new_wind_index
        return new_grid, (new_per_env, shared)
