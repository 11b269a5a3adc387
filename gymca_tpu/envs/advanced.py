"""AdvancedForestFireBulldozer — the flagship batched, partially-observable
wildfire-control environment.

Behavioral counterpart of reference
``forest_fire/bulldozer/advanced_bulldozer.py``:

* batched over ``num_envs`` with cells ``0/1/2 = empty/tree/fire``
  (``advanced_bulldozer.py:163-166``);
* hidden terrain (vegetation / density / altitude / slope / rotating wind)
  driving the Alexandridis CA; ``use_hidden`` toggles random-patch vs uniform
  terrain (``:182-197``);
* dousing: shooting marks ``dousing_count[pos]=1`` which suppresses burn
  probability (``move_modify_jax.py:102-114``, ``ca_alexandridis_jax.py:198``);
* day/night flips every ``day_length=400`` steps; daytime obs are blurred;
  extensions (unblur / see-invisible-fires) are purchasable observation
  channels chosen via a combinatorial action id (``:308-330, 1123-1127``);
* observation = RGB-rendered grid (day/night palettes, dousing tint, agent
  pixel; ``grid_to_rgb``, ``:1035-1101``) + context pytree;
* API: ``reset()``, ``stateless_step(action, obs, info)``,
  ``conditional_reset(step_tuple, action)`` — all jit-compiled
  (``:332-518``);
* reward ``-(f/(t+f+1e-8))`` per env (``:597-630``); done = no fire.

TPU-native improvements (documented in QUIRKS.md):

* terrain/init are pure key-driven JAX (vectorized, jit-able) instead of
  host NumPy loops at ``__init__``;
* ``conditional_reset`` resamples initial states *inside jit* from threaded
  per-env keys — the reference merges trace-frozen initial states
  (``advanced_bulldozer.py:432-518``), so its auto-reset episodes all restart
  from the same grid per compilation;
* the RGB display-channel selection follows the documented intent (first
  *active extension channel*); the reference vmaps over rows instead of
  channels (``:1028-1032``), which can display a zero channel;
* only the cell channel of the initial observation stack is sampled from the
  forest distribution; the reference also fills the position/day-night/
  extension channels with random cells at reset (``:650-661``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces as gym_spaces

from gymca_tpu.config import TYPE_BOX, TYPE_INT
from gymca_tpu.core.spaces import GridSpec
from gymca_tpu.envs import terrain as terrain_mod
from gymca_tpu.envs.extensions import (
    EXTENSION_REGISTRY,
    apply_extensions,
    extension_choices,
    total_extensions,
    transform_grid,
)
from gymca_tpu.ops.alexandridis import AlexandridisCA
from gymca_tpu.ops.move_modify import DEFAULT_DIRECTIONS, ModifyDousing, Move

__all__ = ["AdvancedForestFireBulldozerEnv"]

# Day palette (advanced_bulldozer.py:41-60)
COLOR_EMPTY_DAY = (221, 209, 211)  # "#DDD1D3" gray
COLOR_TREE_DAY = (169, 196, 153)  # "#A9C499" green
COLOR_FIRE_DAY = (230, 129, 129)  # "#E68181" salmon-red
COLOR_POSITION_DAY = (0, 0, 0)

# Night palette
COLOR_EMPTY_NIGHT = (105, 105, 105)  # "#696969"
COLOR_TREE_NIGHT = (47, 79, 79)  # "#2F4F4F"
COLOR_FIRE_NIGHT = (139, 0, 0)  # "#8B0000"
COLOR_POSITION_NIGHT = (0, 0, 0)

DAY_PALETTE = jnp.asarray(
    [COLOR_EMPTY_DAY, COLOR_TREE_DAY, COLOR_FIRE_DAY], TYPE_BOX
)
NIGHT_PALETTE = jnp.asarray(
    [COLOR_EMPTY_NIGHT, COLOR_TREE_NIGHT, COLOR_FIRE_NIGHT], TYPE_BOX
)
WATER_TINT_DAY = jnp.asarray([0.0, 0.0, 200.0], TYPE_BOX)
WATER_TINT_NIGHT = jnp.asarray([255.0, 165.0, 0.0], TYPE_BOX)


class AdvancedForestFireBulldozerEnv:
    """Batched functional env; all public step/reset methods are jitted."""

    metadata = {"render_modes": ["human"], "render_mode": "rgb_array"}

    PER_ENV_CONTEXT_KEYS = {
        "wind_index",
        "density",
        "vegetation",
        "altitude",
        "slope",
        "exp_slope",
        "veg_den_factor",
        "fire_age",
        "key",
        "is_night",
        "true_grid",
        "time_step",
        "dousing_count",
    }
    SHARED_CONTEXT_KEYS = {"winds", "fts", "p_fire", "p_tree", "p_wind_change",
                           "day_length"}

    def __init__(
        self,
        nrows: int,
        ncols: int,
        key,
        num_envs: int = 8,
        speed_move: float = 0.12,
        speed_act: float = 0.03,
        speed_multiplier: float = 1.0,
        pos_bull: Optional[Tuple[int, int]] = None,
        pos_fire: Optional[Tuple[int, int]] = None,
        t_move: Optional[float] = None,
        t_shoot: Optional[float] = None,
        t_any: float = 0.001,
        p_tree: float = 0.90,
        p_empty: float = 0.10,
        use_hidden: bool = True,
        middle_fire: bool = False,
        enable_extensions: bool = False,
        enable_pinecones: bool = False,
        ca_repeat_mode: str = "single",
        use_pallas_ca: bool | None = None,
        obs_dtype=jnp.uint8,
        **kwargs,
    ):
        self.nrows, self.ncols = nrows, ncols
        self.num_envs = num_envs
        # Fused Pallas CA path (performance mode: in-kernel PRNG,
        # distributionally equivalent to the XLA path, not bit-identical).
        # Gated on tile alignment AND the kernel's VMEM budget: <=~320^2
        # runs as one whole-lattice program, 512^2-1024^2 run the row-band
        # tiled kernel (halo rows from neighbor blocks); past W=1024 the
        # (W, W) cumsum matrix alone blows VMEM and the env falls back to
        # the XLA path with a warning.
        # Default (None) = ON where supported: training-curve overlays at
        # 128² (means −621 fused vs −629 XLA, std ~74) and 256² (−1487 vs
        # −1485) match distributionally, the kernel's stochastic fire
        # spread is validated on hardware (validate_fused_ca_tpu.py), and
        # it is never slower — the big win is env-heavy workloads (1.8×
        # env stepping at 256²); PPO training SPS is CNN-bound and
        # measures neutral (clean probes: 8766 vs 8887 at 128²).  Pass
        # False for the bit-reproducible XLA path.
        from gymca_tpu.ops.pallas_alexandridis import supports_fused_alexandridis

        if use_pallas_ca is None:
            # Auto only compiles the kernel where Mosaic exists; CPU/GPU
            # backends get the XLA path (Pallas-TPU is interpret-only there).
            use_pallas_ca = (
                jax.default_backend() == "tpu"
                and ca_repeat_mode == "single"
                and not enable_pinecones
                and supports_fused_alexandridis(nrows, ncols)
            )
        self.use_pallas_ca = bool(
            use_pallas_ca
            and ca_repeat_mode == "single"
            and not enable_pinecones
            and supports_fused_alexandridis(nrows, ncols)
        )
        if use_pallas_ca and not self.use_pallas_ca:
            import warnings

            warnings.warn(
                "use_pallas_ca requested but unsupported for this config "
                f"(nrows={nrows}, ncols={ncols} — needs 8/128 tile alignment "
                "and a per-program VMEM working set under ~14 MB — "
                f"ca_repeat_mode={ca_repeat_mode!r}, "
                f"enable_pinecones={enable_pinecones}); "
                "falling back to the XLA CA path",
                stacklevel=2,
            )
        # RGB observation dtype.  uint8 (default) quarters the obs HBM
        # traffic of every step AND the PPO rollout storage (128 steps x N
        # envs x H x W x 3); palette colors are exact integers, only the
        # dousing-tint mixes round (to the nearest of 256 levels — the CNN
        # consumes grid/255 so the difference is < 0.2% of one input unit).
        # Pass jnp.float32 for bit-parity with the reference's float obs.
        self._obs_dtype = jnp.dtype(obs_dtype)
        self.title = f"ForestFireBulldozer{nrows}x{ncols}"
        self.speed_multiplier = speed_multiplier
        self.middle_fire = middle_fire
        self.use_hidden = use_hidden
        self.enable_extensions = enable_extensions
        self.starting_key = key
        self.ca_repeat_mode = ca_repeat_mode

        self._empty, self._tree, self._fire = 0, 1, 2
        self._pos_bull = pos_bull
        self._pos_fire = pos_fire
        self._p_tree_init = p_tree
        self._p_empty_init = p_empty

        self._p_fire = 0.00033
        self._p_tree = 0.0
        self._p_wind_change = 0.06
        self._day_length = 400

        # --- terrain (sampled once per env instance, like the reference) ----
        # One jitted bundle: per-op eager dispatch on (num_envs, H, W, 3, 3)
        # tensors is prohibitive on tunneled setups, and large host constants
        # can exceed the remote-compile payload limit.
        winds, fts = terrain_mod.get_winds(use_hidden)

        def _terrain_bundle(k):
            _, k_veg, k_den, k_alt = jax.random.split(k, 4)
            if use_hidden:
                density = terrain_mod.init_density(k_den, nrows, ncols, num_envs)
                vegetation = terrain_mod.init_vegetation(
                    k_veg, nrows, ncols, num_envs
                )
                altitude = terrain_mod.init_altitude(k_alt, nrows, ncols, num_envs)
            else:
                density = terrain_mod.init_density_same(nrows, ncols, num_envs)
                vegetation = terrain_mod.init_vegetation_same(
                    nrows, ncols, num_envs
                )
                altitude = terrain_mod.init_altitude_same(nrows, ncols, num_envs)
            slope = terrain_mod.get_slope(altitude)
            from gymca_tpu.ops.alexandridis import AlexandridisCA as _ACA

            return (
                density,
                vegetation,
                altitude,
                slope,
                _ACA.precompute_exp_slope(slope),
                _ACA.precompute_veg_den_factor(vegetation, density),
            )

        density, vegetation, altitude, slope, exp_slope, veg_den_factor = (
            jax.jit(_terrain_bundle)(key)
        )

        self._winds = winds  # (8, 3, 3)
        self._fts = fts  # (8, 3, 3)
        self._wind = winds[0]
        self._density = density
        self._vegitation = vegetation  # (sic) reference attr spelling
        self._altitude = altitude
        self._slope = slope
        # exp(0.078 * slope) is static terrain — the transcendental is
        # hoisted out of the per-step burn test (8 full-grid exp passes
        # otherwise) and computed once in the terrain bundle above.
        self._exp_slope = exp_slope
        self._veg_den_factor = veg_den_factor

        # --- time model -------------------------------------------------------
        # ``speed_multiplier`` scales the agent's effective speed relative to
        # the fire (> 1 = more agent steps per CA application).  DEVIATION
        # NOTE: the reference stores this knob but never consumes it —
        # ``advanced_bulldozer.py:103`` assigns it and the only other use is
        # the run-name string (``jax_ppo.py:434``); the intended semantics
        # (an agent-vs-fire speed curriculum) are implemented here.  The
        # default 1.0 is bit-identical to the reference's timings.
        scale = (nrows + ncols) // 2
        self._t_env_any = t_any
        self._t_act_move = (
            (1 / (speed_move * speed_multiplier * scale)) - t_any
            if t_move is None
            else t_move
        )
        self._t_act_shoot = (
            (1 / (speed_act * speed_multiplier * scale)) - self._t_act_move
            if t_shoot is None
            else t_shoot
        )
        # QUIRK (advanced_bulldozer.py:753-754): unlike the classic Bulldozer,
        # not_move and no-shoot cost the FULL move/shoot time.
        self._move_timings = jnp.full((9,), self._t_act_move, TYPE_BOX)
        self._shoot_timings = jnp.full((2,), self._t_act_shoot, TYPE_BOX)
        self._max_repeats = int(
            math.ceil(self._t_act_move + self._t_act_shoot + t_any)
        ) + 1

        # --- operators ---------------------------------------------------------
        self.ca = AlexandridisCA(
            nrows, self._empty, self._tree, self._fire,
            enable_pinecones=enable_pinecones,
            static_p_tree=self._p_tree,
        )
        self.move = Move(DEFAULT_DIRECTIONS)
        self.modify_dousing = ModifyDousing()

        # --- extension action mapping -------------------------------------------
        self.extension_choices = extension_choices()
        self._extension_lookups = [
            terrain_mod.create_up_to_k_mappings(n, k)[0]
            for n, k in self.extension_choices
        ]

        self._set_spaces()

        # Terrain bundle, passed as runtime args to jitted entry points so it
        # is never baked into HLO as constants.
        self._terrain_ctx = {
            "density": self._density,
            "vegetation": self._vegitation,
            "altitude": self._altitude,
            "slope": self._slope,
            "exp_slope": self._exp_slope,
            "veg_den_factor": self._veg_den_factor,
        }

        # jitted entry points (self is static)
        self._jit_reset = jax.jit(self._reset_impl)
        self.reset = lambda key=None: self._jit_reset(self._terrain_ctx, key)
        self.stateless_step = jax.jit(self._step_impl)
        self.conditional_reset = jax.jit(self._conditional_reset_impl)

    # ------------------------------------------------------------------ spaces

    def _set_spaces(self):
        m, n = 9, 2
        num_envs = self.num_envs
        self.action_space = gym_spaces.MultiDiscrete(
            nvec=np.array([[m, n]] * num_envs), dtype=np.int32
        )
        extension_nvec = np.array(
            [
                sum(math.comb(nn, i) for i in range(k + 1))
                for nn, k in self.extension_choices
            ]
        )
        self.extension_space = gym_spaces.MultiDiscrete(
            nvec=np.array([math.comb(nn, k) for nn, k in self.extension_choices]),
            dtype=np.int32,
        )
        self.total_action_space = gym_spaces.MultiDiscrete(
            nvec=[np.concatenate([np.array([m, n]), extension_nvec])] * num_envs,
            dtype=np.int32,
        )
        self.grid_spec = GridSpec(
            values=(self._empty, self._tree, self._fire),
            shape=(num_envs, self.nrows, self.ncols, 3),
        )
        self.per_env_context_keys = self.PER_ENV_CONTEXT_KEYS
        self.shared_context_keys = self.SHARED_CONTEXT_KEYS

    # --------------------------------------------------------------- initial state

    def _initial_per_env_state(self, key):
        """Fresh initial (cell_grid, fire_age, position) for ONE env."""
        k_grid, k_unused = jax.random.split(key)
        # Cells {0, 1, 2} fit int8: quarters the true_grid/dousing HBM
        # traffic and lets the fused CA kernel stream them natively.
        grid_spec = GridSpec(
            values=(self._empty, self._tree, self._fire),
            probs=(self._p_empty_init, self._p_tree_init, 0.0),
            shape=(self.nrows, self.ncols),
            dtype=jnp.int8,
        )
        grid = grid_spec.sample(k_grid)

        if self._pos_fire is not None:
            fr, fc = self._pos_fire
        elif self.middle_fire:
            fr, fc = self.nrows // 2, self.ncols // 2
        else:
            fr, fc = 3 * self.nrows // 4, 1 * self.ncols // 4
        # two-cell fire seed (advanced_bulldozer.py:663-688)
        initial_fire_age = (self.nrows + self.nrows // 2) * 2
        fire_age = jnp.zeros((self.nrows, self.ncols), TYPE_BOX)
        grid = grid.at[fr, fc].set(self._fire).at[fr, fc - 1].set(self._fire)
        fire_age = (
            fire_age.at[fr, fc].set(initial_fire_age)
            .at[fr, fc - 1].set(initial_fire_age)
        )

        if self._pos_bull is not None:
            br, bc = self._pos_bull
        else:
            # fixed 15% from the upper-right corner (advanced_bulldozer.py:693-701)
            br, bc = int(self.nrows * 0.15), int(self.ncols * 0.85)
        position = jnp.asarray([br, bc], TYPE_INT)
        return grid, fire_age, position

    def _shared_context(self):
        return {
            "winds": self._winds,
            "fts": self._fts,
            "p_fire": jnp.asarray(self._p_fire, TYPE_BOX),
            "p_tree": jnp.asarray(self._p_tree, TYPE_BOX),
            "p_wind_change": jnp.asarray(self._p_wind_change, TYPE_BOX),
            "day_length": self._day_length,
        }

    def initial_state(self, key=None, terrain=None):
        """Batched initial (grid_stack, context).  Pure given ``key``.

        ``terrain``: optional dict of the per-instance terrain tensors; when
        jitting a caller, pass them as runtime arguments — closed-over arrays
        get embedded in the compiled program as constants (hundreds of MB at
        large ``num_envs``).
        """
        key = self.starting_key if key is None else key
        terrain = terrain if terrain is not None else self._terrain_ctx
        k_winds, k_envs = jax.random.split(key)
        env_keys = jax.random.split(k_envs, self.num_envs)

        grids, fire_ages, positions = jax.vmap(self._initial_per_env_state)(env_keys)

        wind_index = (
            jax.random.randint(k_winds, (self.num_envs,), 0, 8, dtype=TYPE_INT)
            if self.use_hidden
            else jnp.zeros((self.num_envs,), TYPE_INT)
        )
        carry_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(env_keys)
        per_env_context = {
            "wind_index": wind_index,
            **terrain,
            "fire_age": fire_ages,
            "key": carry_keys,
            "is_night": jnp.zeros(self.num_envs, TYPE_INT),
            "true_grid": grids,
            "time_step": jnp.ones(self.num_envs, TYPE_INT),
            "dousing_count": jnp.zeros_like(grids, dtype=jnp.int8),
        }
        context = {
            "per_env_context": per_env_context,
            "shared_context": self._shared_context(),
            "position": positions,
            "time": jnp.zeros(self.num_envs, TYPE_BOX),
        }
        # (N, H, W, 3)-channel observation stack: cell grid + zero pos/day
        grid_stack = jnp.stack(
            [grids.astype(TYPE_BOX)]
            + [jnp.zeros_like(grids, dtype=TYPE_BOX)] * 2,
            axis=-1,
        )
        return grid_stack, context

    # ------------------------------------------------------------------- actions

    def _create_full_actions(self, action):
        """(N, 2 + n_registries) combinatorial ids -> (N, 2 + total_ext)
        binary bits (advanced_bulldozer.py:308-330)."""
        action = jnp.asarray(action)
        expected = 2 + len(self._extension_lookups)
        if action.shape[-1] != expected:
            raise ValueError(
                f"action must have {expected} columns "
                f"(move, shoot, {len(self._extension_lookups)} extension id(s)); "
                f"got shape {action.shape}"
            )
        base = action[:, :2]
        binary_actions = []
        for i, lookup in enumerate(self._extension_lookups):
            choice = action[:, 2 + i]
            binary_actions.append(jnp.take(lookup, choice, axis=0))
        if binary_actions:
            return jnp.concatenate([base] + binary_actions, axis=-1)
        return base

    # --------------------------------------------------------------- observation

    def _grid_to_rgb(self, display_grid, is_night, dousing_count, position):
        """Palette render + dousing tint + agent pixel
        (advanced_bulldozer.py:1035-1101).  ONE env.

        Table lookups / point writes are expressed as masked selects: TPU has
        no vector gather/scatter, so ``palette[idx]`` and ``.at[pos].set``
        lower to serial paths XLA can't fuse (measured several ms per step).

        In uint8 obs mode the whole pipeline runs in INTEGER math — the
        palettes/tints are integer-valued and the only blend is 0.25/0.75,
        so ``round(rgb*0.25 + water*0.75)`` (round-half-to-even) equals the
        fixed-point ``q + (r==3) + (r==2 and q odd)`` of ``v = rgb + 3*water``
        exactly; bit-identity with the f32 path is pinned in
        tests/test_advanced.py.  This keeps every (H, W, 3) intermediate in
        narrow integer lanes instead of f32 (the obs epilogue is HBM/fusion
        bound, docs/architecture.md §Advanced-step attribution).
        """
        idx = jnp.clip(display_grid.astype(TYPE_INT), 0, 2)
        h, w = idx.shape
        at_pos = (
            (jax.lax.broadcasted_iota(TYPE_INT, (h, w), 0) == position[0])
            & (jax.lax.broadcasted_iota(TYPE_INT, (h, w), 1) == position[1])
        )
        if self._obs_dtype == jnp.uint8:
            palette = jnp.where(
                is_night > 0, NIGHT_PALETTE, DAY_PALETTE
            ).astype(jnp.int32)
            water = jnp.where(
                is_night > 0, WATER_TINT_NIGHT, WATER_TINT_DAY
            ).astype(jnp.int32)
            rgb = jnp.zeros(idx.shape + (3,), jnp.int32)
            for v in range(3):
                rgb = jnp.where((idx == v)[..., None], palette[v], rgb)
            # 0.25*rgb + 0.75*water, round-half-to-even (matches jnp.round
            # of the exact f32 value: v/4 with v, q = v>>2, r = v&3)
            v = rgb + 3 * water
            q = v >> 2
            r = v & 3
            blended = q + (r == 3) + ((r == 2) & ((q & 1) == 1))
            rgb = jnp.where((dousing_count == 1)[..., None], blended, rgb)
            rgb = jnp.where(at_pos[..., None], 0, rgb)
            return rgb.astype(jnp.uint8)
        palette = jnp.where(is_night > 0, NIGHT_PALETTE, DAY_PALETTE)
        # one-hot select instead of gather
        rgb = jnp.zeros(idx.shape + (3,), TYPE_BOX)
        for v in range(3):
            rgb = jnp.where((idx == v)[..., None], palette[v], rgb)

        dousing_strength = jnp.where(dousing_count == 1, 0.75, 0.0)[..., None]
        water = jnp.where(is_night > 0, WATER_TINT_NIGHT, WATER_TINT_DAY)
        dousing_mask = (dousing_count > 0)[..., None]
        rgb = jnp.where(
            dousing_mask, rgb * (1 - dousing_strength) + water * dousing_strength, rgb
        )
        # position pixel: black in both palettes (advanced_bulldozer.py:44,50)
        rgb = jnp.where(at_pos[..., None], 0.0, rgb)
        return rgb.astype(self._obs_dtype)

    def _display_grid(self, extended_grid):
        """First ACTIVE extension channel, else base channel
        (intent of advanced_bulldozer.py:1020-1033; see QUIRKS.md)."""
        base = extended_grid[..., 0]
        extensions = extended_grid[..., 3:]
        k = extensions.shape[-1]
        if k == 0:
            return base
        has_ext = jnp.any(extensions > 0, axis=(-3, -2))  # per channel
        first_valid = jnp.argmax(has_ext)
        # static unrolled select instead of a dynamic minor-axis gather
        out = base
        any_ext = jnp.any(has_ext)
        for c in range(k):
            out = jnp.where(any_ext & (first_valid == c), extensions[..., c], out)
        return out

    def build_observation_on_extensions(
        self, grid, position, full_action, per_env, shared
    ):
        """Channel stack + RGB for ONE env (advanced_bulldozer.py:988-1018)."""
        is_night = per_env["is_night"]
        if self.enable_extensions and len(EXTENSION_REGISTRY) > 0:
            transformed = transform_grid(grid, is_night, 0, 0)
        else:
            transformed = grid
        channels = [
            transformed.astype(TYPE_BOX),
            jnp.zeros_like(grid, dtype=TYPE_BOX),  # position channel (zeros)
            jnp.zeros_like(grid, dtype=TYPE_BOX),  # day/night channel (zeros)
        ]
        ext_channels = apply_extensions(
            grid, full_action[2:], is_night, self.enable_extensions
        )
        extended = jnp.stack(
            channels + [c.astype(TYPE_BOX) for c in ext_channels], axis=-1
        )
        rgb = self._grid_to_rgb(
            self._display_grid(extended), is_night, per_env["dousing_count"],
            position,
        )
        return rgb, extended

    def grid_to_rgb_with_extensions(self, extended_grid, per_env, position):
        return self._grid_to_rgb(
            self._display_grid(extended_grid),
            per_env["is_night"],
            per_env["dousing_count"],
            position,
        )

    # ----------------------------------------------------------------- MDP (one env)

    def _mdp_single(self, true_grid, full_action, per_env, shared, position, time):
        """One env's MDP transition (advanced_bulldozer.py:1103-1133)."""
        key = per_env["key"]
        key, k_ca = jax.random.split(key)

        # RepeatCA time bookkeeping; 'single' mode = reference JAX stack
        # (repeat_ca_jax.py:61-69), 'modf' = classic masked-repeat semantics.
        time_taken = (
            self._move_timings[full_action[0]]
            + self._shoot_timings[full_action[1]]
            + self._t_env_any
        )
        frac, repeats = jnp.modf(time + time_taken)

        ca_in = dict(per_env)
        ca_in["key"] = key
        if self.ca_repeat_mode == "single":
            grid, (next_per_env, _) = self.ca(true_grid, full_action, (ca_in, shared), k_ca)
        else:
            repeats_i = repeats.astype(TYPE_INT)
            ca_keys = jax.random.split(k_ca, self._max_repeats)

            def body(i, carry):
                grid, ctx = carry
                new_grid, (new_ctx, _) = self.ca(grid, full_action, (ctx, shared),
                                                 ca_keys[i])
                pred = i < repeats_i
                grid = jnp.where(pred, new_grid, grid)
                ctx = jax.tree.map(
                    lambda new, old: jnp.where(
                        jnp.reshape(pred, (1,) * jnp.ndim(new)), new, old
                    ),
                    new_ctx,
                    ctx,
                )
                return grid, ctx

            grid, next_per_env = jax.lax.fori_loop(
                0, self._max_repeats, body, (true_grid, ca_in)
            )

        return self._post_ca_single(
            grid, next_per_env, full_action, per_env, shared, position, frac
        )

    def _post_ca_single(self, grid, next_per_env, full_action, per_env, shared,
                        position, frac):
        """Everything after the CA: move + dousing write + day/night + obs.
        Shared by the XLA and Pallas CA paths."""
        # Move + dousing write (move_modify_jax.py:148-157).
        position = self.move.update(grid, full_action[0], position)[1]
        _, (_, next_per_env["dousing_count"]) = self.modify_dousing.update(
            grid, full_action[1], (position, next_per_env["dousing_count"])
        )

        next_per_env["true_grid"] = grid
        next_per_env["time_step"] = next_per_env["time_step"] + 1

        # QUIRK reproduced: observation is rendered with the PRE-step context
        # (is_night / dousing lag one step — advanced_bulldozer.py:1120-1122).
        rgb, extended = self.build_observation_on_extensions(
            grid, position, full_action, per_env, shared
        )

        next_per_env["is_night"] = jnp.where(
            next_per_env["time_step"] % shared["day_length"] == 0,
            1 - next_per_env["is_night"],
            next_per_env["is_night"],
        )
        return (rgb, grid, extended), (next_per_env, position, frac.astype(TYPE_BOX))

    # --------------------------------------------------------------- public API

    def _per_env_in_axes(self):
        return {k: 0 for k in self.PER_ENV_CONTEXT_KEYS}

    def _mdp_batch_pallas(self, true_grid, full_actions, per_env, shared,
                          position, time):
        """Batched MDP with the fused Pallas CA kernel (performance mode)."""
        from gymca_tpu.ops.pallas_alexandridis import alexandridis_fused_step
        from gymca_tpu.ops.stencil import NEIGHBOR_OFFSETS, telescoped_box_coeffs

        # key threading as in _mdp_single: carry key splits; CA randomness
        # comes from the kernel PRNG seeded from k_ca.
        def derive(key):
            # Accept legacy uint32 key arrays like the XLA path does
            # (jax.random.key_data rejects them); hand the carry key back in
            # the caller's own format so pytree dtypes stay stable.
            legacy = not jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
            if legacy:
                key = jax.random.wrap_key_data(key)
            key, k_ca = jax.random.split(key)
            # Both 32-bit words of the threefry key seed the kernel PRNG — a
            # single 31-bit seed would birthday-collide over long runs.
            seed = jax.random.key_data(k_ca).astype(jnp.int32)
            k_wchange = jax.random.fold_in(k_ca, 1)
            k_widx = jax.random.fold_in(k_ca, 2)
            if legacy:
                key = jax.random.key_data(key)
            return key, seed, k_wchange, k_widx

        keys, seeds, k_wchange, k_widx = jax.vmap(derive)(per_env["key"])

        time_taken = (
            self._move_timings[full_actions[:, 0]]
            + self._shoot_timings[full_actions[:, 1]]
            + self._t_env_any
        )
        frac, _ = jnp.modf(time + time_taken)

        wm = shared["winds"][per_env["wind_index"]]  # (N, 3, 3)
        wind_rows = jnp.stack(
            [wm[:, 1 + dr, 1 + dc] for dr, dc in NEIGHBOR_OFFSETS], axis=-1
        )

        ca = self.ca
        new_grid, new_age = alexandridis_fused_step(
            true_grid,
            per_env["fire_age"],
            per_env["dousing_count"],
            per_env["veg_den_factor"],
            per_env["exp_slope"],
            wind_rows,
            seeds,
            empty=self._empty, tree=self._tree, fire=self._fire,
            layer_coeffs=telescoped_box_coeffs(ca.burn_layer_weights),
            dousing_border=float(ca._dousing_border),
            dousing_inner=float(ca._dousing_inner),
            fire_age_min=int(ca.fire_age_min),
            fire_age_max=int(ca.fire_age_max),
        )

        # stochastic wind rotation (vmapped scalars, as the XLA CA does)
        n_winds = shared["winds"].shape[0]
        wind_change = jax.vmap(jax.random.uniform)(k_wchange) < shared[
            "p_wind_change"
        ]
        new_wind_index = jnp.where(
            wind_change,
            (per_env["wind_index"]
             + jax.vmap(lambda k: jax.random.randint(k, (), 1, 8))(k_widx))
            % n_winds,
            per_env["wind_index"],
        )

        next_per_env = dict(per_env)
        next_per_env["key"] = keys
        next_per_env["fire_age"] = new_age.astype(per_env["fire_age"].dtype)
        next_per_env["wind_index"] = new_wind_index

        return jax.vmap(
            self._post_ca_single,
            in_axes=(0, self._per_env_in_axes(), 0,
                     self._per_env_in_axes(), None, 0, 0),
        )(new_grid.astype(true_grid.dtype), next_per_env, full_actions,
          per_env, shared, position, frac)

    def _step_impl(self, action, obs, info):
        grid_stack, context = obs
        per_env = context["per_env_context"]
        shared = context["shared_context"]
        true_grid = per_env["true_grid"]

        full_actions = self._create_full_actions(action)

        if self.use_pallas_ca:
            (rgb, next_true_grid, extended), (next_per_env, next_pos, next_time) = (
                self._mdp_batch_pallas(
                    true_grid, full_actions, per_env, shared,
                    context["position"], context["time"],
                )
            )
        else:
            (rgb, next_true_grid, extended), (next_per_env, next_pos, next_time) = (
                jax.vmap(
                    self._mdp_single,
                    in_axes=(0, 0, self._per_env_in_axes(), None, 0, 0),
                )(
                    true_grid,
                    full_actions,
                    per_env,
                    shared,
                    context["position"],
                    context["time"],
                )
            )

        context = dict(context)
        context["per_env_context"] = next_per_env
        context["position"] = next_pos
        context["time"] = next_time

        next_done = jax.vmap(self._is_done)(next_true_grid)
        reward = jax.vmap(self._award)(next_true_grid)
        # shape-polymorphic over the env axis (works on shard-local batches)
        truncated = jnp.full((next_true_grid.shape[0],), False)

        info = dict(info)
        info["reward"] = reward
        info["terminated"] = next_done
        info["TimeLimit.truncated"] = truncated
        info["steps_elapsed"] = info["steps_elapsed"] + 1
        info["reward_accumulated"] = info["reward_accumulated"] + reward

        return (rgb, context), reward, next_done, truncated, info

    def _reset_impl(self, terrain, key=None):
        grid_stack, context = self.initial_state(key, terrain)
        per_env = context["per_env_context"]
        rgb = jax.vmap(
            self.grid_to_rgb_with_extensions,
            in_axes=(0, self._per_env_in_axes(), 0),
        )(grid_stack, per_env, context["position"])
        obs = (rgb, context)
        n = self.num_envs
        info = {
            "TimeLimit.truncated": jnp.full((n,), False),
            "terminated": jnp.full((n,), False),
            "steps_elapsed": jnp.zeros((n,)),
            "reward_accumulated": jnp.zeros((n,)),
            "reward": jnp.zeros((n,)),
        }
        return obs, info

    def _conditional_reset_impl(self, step_tuple, action):
        """Auto-reset terminated envs with FRESH initial states sampled from
        the threaded per-env keys (fixes the reference's trace-frozen initial
        states, advanced_bulldozer.py:422-518)."""

        def reset_fn(step_tuple):
            obs, reward, terminated, truncated, info = step_tuple
            rgb, context = obs
            context = dict(context)
            per_env = dict(context["per_env_context"])
            shared = context["shared_context"]
            true_grid = per_env["true_grid"]

            # fresh initial states per env
            reset_keys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(per_env["key"])
            f_grids, f_ages, f_positions = jax.vmap(self._initial_per_env_state)(
                reset_keys
            )
            f_keys = jax.vmap(lambda k: jax.random.fold_in(k, 8))(reset_keys)

            def merge(fresh, cur):
                d = jnp.reshape(terminated, terminated.shape + (1,) * (fresh.ndim - 1))
                return jnp.where(d, fresh, cur)

            merged_grid = merge(f_grids, true_grid)
            context["position"] = merge(f_positions, context["position"])
            context["time"] = merge(jnp.zeros_like(context["time"]), context["time"])

            per_env["fire_age"] = merge(f_ages, per_env["fire_age"])
            per_env["key"] = merge(f_keys, per_env["key"])
            per_env["dousing_count"] = merge(
                jnp.zeros_like(per_env["dousing_count"]), per_env["dousing_count"]
            )
            per_env["wind_index"] = merge(
                jnp.zeros_like(per_env["wind_index"]), per_env["wind_index"]
            ) if not self.use_hidden else jnp.where(
                terminated,
                jax.vmap(
                    lambda k: jax.random.randint(k, (), 0, 8, dtype=TYPE_INT)
                )(reset_keys),
                per_env["wind_index"],
            )
            # QUIRK reproduced: time_step and is_night persist across episodes
            # (advanced_bulldozer.py:489-499 skips those keys).
            per_env["true_grid"] = merged_grid

            # re-render observations for the reset envs
            full_actions = self._create_full_actions(action)
            fresh_rgb = jax.vmap(
                lambda g, p, a, pe: self.build_observation_on_extensions(
                    g, p, a, pe, shared
                )[0],
                in_axes=(0, 0, 0, self._per_env_in_axes()),
            )(merged_grid, context["position"], full_actions, per_env)
            next_rgb = jnp.where(
                jnp.reshape(terminated, (-1, 1, 1, 1)), fresh_rgb, rgb
            )

            context["per_env_context"] = per_env
            info = dict(info)
            info["steps_elapsed"] = jnp.where(terminated, 0, info["steps_elapsed"])
            info["reward_accumulated"] = jnp.where(
                terminated, 0.0, info["reward_accumulated"]
            )
            reward = jax.vmap(self._award)(merged_grid)
            new_terminated = jnp.zeros_like(terminated)
            return (next_rgb, context), reward, new_terminated, truncated, info

        return jax.lax.cond(
            step_tuple[2].any(), reset_fn, lambda s: s, step_tuple
        )

    # ----------------------------------------------------------- reward / done

    def _award(self, grid):
        """-(f / (t + f + 1e-8)) (advanced_bulldozer.py:597-630)."""
        t = jnp.sum(grid == self._tree).astype(TYPE_BOX)
        f = jnp.sum(grid == self._fire).astype(TYPE_BOX)
        return -(f / (t + f + 1e-8))

    def _is_done(self, grid):
        return jnp.invert(jnp.any(grid == self._fire))

    def count_cells(self, grid):
        return {
            self._empty: jnp.sum(grid == self._empty),
            self._tree: jnp.sum(grid == self._tree),
            self._fire: jnp.sum(grid == self._fire),
        }

    # ----------------------------------------------------------------- rendering

    def render(self, obs, info=None, env_idx: int = 0):  # pragma: no cover
        """Render one env of the batch.  The env is stateless, so the caller
        passes the (rgb, context) obs returned by reset()/stateless_step()
        (the reference captures the same data per frame,
        ``scripts/run:392-468``)."""
        from gymca_tpu.utils.render import render_advanced

        return render_advanced(self, obs, info, env_idx)

    def altitude_render(self):  # pragma: no cover - host-side
        from gymca_tpu.utils.render import plot_grid_attribute

        return [plot_grid_attribute(self._altitude[i], "Altitude")
                for i in range(self.num_envs)]

    def density_render(self):  # pragma: no cover - host-side
        from gymca_tpu.utils.render import plot_grid_attribute

        return [plot_grid_attribute(self._density[i], "Density")
                for i in range(self.num_envs)]

    def vegitation_render(self):  # pragma: no cover - host-side
        from gymca_tpu.utils.render import plot_grid_attribute

        return [plot_grid_attribute(self._vegitation[i], "Vegitation")
                for i in range(self.num_envs)]
