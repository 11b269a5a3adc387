"""ForestFireBulldozer — 256x256 windy wildfire-control task.

Behavioral counterpart of reference ``forest_fire/bulldozer/bulldozer.py``:

* cells ``0/3/25 = empty/tree/fire`` (values required by the windy
  convolution encoding, ``bulldozer.py:87-89``);
* wind dict -> 3x3 propagation-probability matrix (``bulldozer.py:299-316``);
* initial grid ~ p_tree=0.90 / p_empty=0.10 with one fire seed around the
  lower-left quadrant (+1/12-axis noise) and the bulldozer around the
  upper-right (``bulldozer.py:221-275``);
* time model ``t_any=0.001``, ``t_move=(1/(speed_move*scale))-t_any``,
  ``t_shoot=(1/(speed_act*scale))-t_move`` with not_move/none costing 0
  (``bulldozer.py:111-160, 277-297``);
* MDP = RepeatCA(windy) then MoveModify (``bulldozer.py:393-400``);
* reward ``-(f/(t+f))`` (``bulldozer.py:180-213``); terminates when no fire
  remains (``bulldozer.py:215-216``).

TPU-native differences (documented, intentional):
* fully functional core (state pytree, explicit keys) — batch via vmap;
* the fire/bulldozer placement noise is resampled *every* reset from the
  state key (the reference caches the first sample forever,
  ``bulldozer.py:246-248`` — a quirk, see QUIRKS.md);
* the data-dependent CA repeat count runs as a statically-bounded masked loop.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gymca_tpu.config import TYPE_BOX, TYPE_INT
from gymca_tpu.core.env import CAEnvCore, EnvState, GymCAEnv, StepOutput
from gymca_tpu.core.operator import Operator
from gymca_tpu.core.spaces import (
    BoxSpec,
    GridSpec,
    MultiDiscreteSpec,
    TupleSpec,
)
from gymca_tpu.ops.move_modify import (
    DEFAULT_DIRECTIONS,
    Modify,
    Move,
    MoveModify,
    move_position,
)
from gymca_tpu.ops.repeat_ca import RepeatCA
from gymca_tpu.ops.windy import WindyForestFire

__all__ = ["BulldozerCore", "ForestFireBulldozerEnv", "DEFAULT_WIND",
           "derive_step_key"]


def derive_step_key(key):
    """Replicate the per-step key threading of ``CAEnvCore.step`` → MDP →
    RepeatCA → windy uniform for the fused/sharded fast paths: returns
    ``(carry_key, roll)`` where ``roll`` is the (3, 3) gust sample the XLA
    reference path would draw.  Bit-identical key chain by construction."""
    carry, sub = jax.random.split(key)
    k_ca, _ = jax.random.split(sub)
    (k0,) = jax.random.split(k_ca, 1)
    roll = jax.random.uniform(k0, (3, 3), dtype=jnp.float32)
    return carry, roll

DEFAULT_WIND = {
    "up_left": 0.48,
    "up": 0.64,
    "up_right": 0.98,
    "left": 0.12,
    "right": 0.64,
    "down_left": 0.06,
    "down": 0.12,
    "down_right": 0.48,
}


def parse_wind(wind: dict) -> jnp.ndarray:
    """Wind dict -> 3x3 matrix (reference bulldozer.py:299-316)."""
    mat = jnp.asarray(
        [
            [wind["up_left"], wind["up"], wind["up_right"]],
            [wind["left"], 0.0, wind["right"]],
            [wind["down_left"], wind["down"], wind["down_right"]],
        ],
        dtype=TYPE_BOX,
    )
    assert bool(jnp.all((mat >= 0.0) & (mat <= 1.0))), (
        "Bad Wind Data, check ranges [0.0, 1.0]"
    )
    return mat


class BulldozerMDP(Operator):
    """RepeatCA then MoveModify (reference bulldozer.py:378-400).

    Context is a dict {wind, position, time, hit}; ``hit`` is produced by the
    Modify suboperator and consumed by the env report.
    """

    grid_dependant = True
    action_dependant = True
    context_dependant = True
    deterministic = False

    def __init__(self, repeat_ca: RepeatCA, move_modify: MoveModify, tree: int,
                 fire: int, **kwargs):
        super().__init__(**kwargs)
        self.repeat_ca = repeat_ca
        self.move_modify = move_modify
        self.tree, self.fire = tree, fire
        self.suboperators = (repeat_ca, move_modify)

    def update(self, grid, action, context, key=None):
        k_ca, _ = jax.random.split(key)
        grid, (wind, time) = self.repeat_ca(
            grid, action, (context["wind"], context["time"]), k_ca
        )
        grid, (position, hit) = self.move_modify(grid, action, context["position"])
        # Cell counts ride in the context so reward/termination (and the
        # sparse Pallas kernel's skipped steps) never re-reduce the grid.
        return grid, {
            "wind": wind,
            "position": position,
            "time": time,
            "hit": hit,
            "pos_fire": context["pos_fire"],  # episode constant (for render)
            "tree_count": jnp.sum(grid == self.tree).astype(TYPE_INT),
            "fire_count": jnp.sum(grid == self.fire).astype(TYPE_INT),
            # Eager path: Modify writes land in the grid immediately, so the
            # deferred-edit log is threaded through empty.
            "edit_log": context["edit_log"],
            "edit_count": context["edit_count"],
        }


class BulldozerCore(CAEnvCore):
    """Functional windy-Bulldozer core."""

    def __init__(
        self,
        nrows: int,
        ncols: int,
        speed_move: float = 0.12,
        speed_act: float = 0.03,
        pos_bull: Optional[Tuple[int, int]] = None,
        pos_fire: Optional[Tuple[int, int]] = None,
        t_move: Optional[float] = None,
        t_shoot: Optional[float] = None,
        t_any: float = 0.001,
        p_tree: float = 0.90,
        p_empty: float = 0.10,
        wind: dict = None,
        grid_dtype=None,
    ):
        self.nrows, self.ncols = nrows, ncols
        self.title = f"ForestFireBulldozer{nrows}x{ncols}"

        # Cell values {0, 3, 25} fit int8; storing grids at 1 byte/cell
        # quarters HBM traffic and VMEM footprint vs the reference's int64
        # (the stencil arithmetic still runs in int32 — the windy scores
        # reach 2^11 * 25).  int8's Mosaic tile needs 32-row alignment
        # though, so grids that only tile at int32's 8 rows (h % 32 != 0)
        # default to int32 to keep their fused fast path.  Pass grid_dtype
        # explicitly to override.
        if grid_dtype is None:
            from gymca_tpu.ops.pallas_kernels import supports_sparse_kernel

            grid_dtype = (
                jnp.int8
                if supports_sparse_kernel(nrows, ncols, 1)
                or not supports_sparse_kernel(nrows, ncols, 4)
                else jnp.int32
            )
        self._grid_dtype = jnp.dtype(grid_dtype)
        self._empty, self._tree, self._fire = 0, 3, 25
        self._pos_bull = pos_bull
        self._pos_fire = pos_fire
        self._p_tree = p_tree
        self._p_empty = p_empty
        self._wind = parse_wind(wind or DEFAULT_WIND)
        self._effects = {self._tree: self._empty}

        # Time model (reference bulldozer.py:111-160)
        scale = (nrows + ncols) // 2
        self._t_env_any = t_any
        self._t_act_none = 0.0
        self._t_act_move = (1 / (speed_move * scale)) - t_any if t_move is None else t_move
        self._t_act_shoot = (
            (1 / (speed_act * scale)) - self._t_act_move if t_shoot is None else t_shoot
        )

        # Timing tables: not_move (4) and no-shoot (0) cost nothing
        # (reference bulldozer.py:277-297).
        move_t = [self._t_act_move] * 9
        move_t[4] = self._t_act_none
        shoot_t = [self._t_act_none, self._t_act_shoot]
        self._move_timings = jnp.asarray(move_t, TYPE_BOX)
        self._shoot_timings = jnp.asarray(shoot_t, TYPE_BOX)

        # accu_time fraction carried is < 1, so repeats per step is at most
        # floor(1 + max_step_time): 1 for big grids (step time ~0.13), more
        # for small grids where per-step time exceeds one CA period.
        max_step_time = self._t_act_move + self._t_act_shoot + t_any
        max_repeats = max(int(math.floor(1.0 + max_step_time)), 1)

        # Deferred-edit log capacity for the fused batched step: every
        # logged edit comes from a shoot step that did NOT cross a CA period,
        # and each such step advances accu_time by at least
        # delta = t_shoot + t_any, so at most floor(1/delta) edits can
        # accumulate between CA applications (the crossing step's shot is
        # handled in-kernel).  +1 headroom; overflow (possible only when the
        # cap binds) falls back to the kernel's eager modify class.
        delta = self._t_act_shoot + t_any
        self._edit_log_k = (
            0 if delta <= 0 else min(int(math.floor(1.0 / delta)) + 1, 64)
        )

        def t_acting(action):
            return (
                self._move_timings[action[..., 0]]
                + self._shoot_timings[action[..., 1]]
            )

        def t_perception(state):
            return jnp.asarray(self._t_env_any, TYPE_BOX)

        self._set_specs()

        self.ca = WindyForestFire(self._empty, self._tree, self._fire)
        self.move = Move(DEFAULT_DIRECTIONS)
        self.modify = Modify(self._effects)
        self.move_modify = MoveModify(self.move, self.modify)
        self.repeater = RepeatCA(
            self.ca, t_acting, t_perception, max_repeats=max_repeats, mode="modf"
        )
        self._mdp = BulldozerMDP(
            self.repeater, self.move_modify, self._tree, self._fire
        )

    # --- specs ---------------------------------------------------------------

    def _set_specs(self):
        nrows, ncols = self.nrows, self.ncols
        self.grid_spec = GridSpec(
            values=(self._empty, self._tree, self._fire), shape=(nrows, ncols),
            dtype=self._grid_dtype,
        )
        self.ca_params_spec = BoxSpec(0.0, 1.0, shape=(3, 3))
        self.position_spec = MultiDiscreteSpec((nrows, ncols))
        self.time_spec = BoxSpec(0.0, float("inf"), shape=())
        self.context_spec = TupleSpec(
            (self.ca_params_spec, self.position_spec, self.time_spec)
        )
        self.action_spec = MultiDiscreteSpec((9, 2))
        self.observation_spec = TupleSpec((self.grid_spec, self.context_spec))

    @property
    def mdp(self):
        return self._mdp

    # --- initial state ---------------------------------------------------------

    def _noise(self, key, ax_len: int):
        """1/12-axis placement noise (reference bulldozer.py:221-231)."""
        upper = int(ax_len * (1 / 12))
        if upper <= 0:
            return jnp.asarray(0, TYPE_INT)
        return jax.random.randint(key, (), 0, upper, dtype=TYPE_INT)

    def initial_state(self, key) -> EnvState:
        k_grid, k_fire_r, k_fire_c, k_bull_r, k_bull_c, k_carry = jax.random.split(
            key, 6
        )
        grid_spec = GridSpec(
            values=(self._empty, self._tree, self._fire),
            probs=(self._p_empty, self._p_tree, 0.0),
            shape=(self.nrows, self.ncols),
            dtype=self._grid_dtype,
        )
        grid = grid_spec.sample(k_grid)

        # Fire seed around the lower-left quadrant (bulldozer.py:244-252).
        if self._pos_fire is None:
            fr = 3 * self.nrows // 4 + self._noise(k_fire_r, self.nrows)
            fc = 1 * self.ncols // 4 + self._noise(k_fire_c, self.ncols)
        else:
            fr, fc = self._pos_fire
        grid = grid.at[fr, fc].set(self._fire)

        # Bulldozer around the upper-right quadrant (bulldozer.py:255-267).
        if self._pos_bull is None:
            br = 1 * self.nrows // 4 + self._noise(k_bull_r, self.nrows)
            bc = 3 * self.ncols // 4 + self._noise(k_bull_c, self.ncols)
        else:
            br, bc = self._pos_bull
        position = jnp.stack(
            [jnp.asarray(br, TYPE_INT), jnp.asarray(bc, TYPE_INT)]
        )

        context = {
            "wind": self._wind,
            "position": position,
            "time": jnp.asarray(0.0, TYPE_BOX),
            "hit": jnp.asarray(False),
            "pos_fire": jnp.stack(
                [jnp.asarray(fr, TYPE_INT), jnp.asarray(fc, TYPE_INT)]
            ),
            "tree_count": jnp.sum(grid == self._tree).astype(TYPE_INT),
            "fire_count": jnp.sum(grid == self._fire).astype(TYPE_INT),
            # Write-back log of deferred Modify cell writes (fused batched
            # path only; the eager paths keep it empty).  Packed row|col<<16
            # words; entries [0, edit_count) are pending.
            "edit_log": jnp.zeros((self._edit_log_k,), jnp.int32),
            "edit_count": jnp.asarray(0, jnp.int32),
        }
        return EnvState(
            grid=grid,
            context=context,
            key=k_carry,
            done=jnp.asarray(False),
            steps_elapsed=jnp.asarray(0, TYPE_INT),
            reward_accumulated=jnp.asarray(0.0, TYPE_BOX),
        )

    # --- reward / termination / report -----------------------------------------

    def observe(self, state: EnvState):
        c = state.context
        return state.grid, (c["wind"], c["position"], c["time"])

    # --- fused batched step (Pallas) -------------------------------------------

    def supports_fused_step(self) -> bool:
        """The fused kernel covers the one-CA-application-per-step regime
        (``max_repeats == 1`` — true for all registered grid sizes; tiny debug
        grids where a step spans multiple CA periods fall back to vmap) and
        needs tile-aligned grids for its Modify fast path."""
        from gymca_tpu.ops.pallas_kernels import supports_sparse_kernel

        return self.repeater.max_repeats == 1 and supports_sparse_kernel(
            self.nrows, self.ncols, self._grid_dtype.itemsize
        )

    def step_batched(
        self,
        states: EnvState,
        actions,
        *,
        interpret: bool = False,
        stencil: str = "auto",
    ):
        """Batched step over N envs via the fused Pallas kernel.

        Semantically identical to ``jax.vmap(self.step)`` (same key
        derivation, same integer stencil arithmetic, same float32 reward
        ops) — every per-step OUTPUT (reward, done, hit info, counts) is
        bit-identical — but the whole CA + Modify + reward-count pipeline
        runs as one single-pass VMEM kernel
        (``gymca_tpu.ops.pallas_kernels.windy_fused_step``).

        Grid representation: Modify's single-cell writes are DEFERRED into a
        bounded per-env write-back log (``context['edit_log']``) instead of
        paying ~150 ns of scalar-core DMA issue per cell, and are flushed
        into the HBM grid at the env's next CA application (before the
        stencil, so propagation sees them exactly as eager writes).  Between
        CA applications ``states.grid`` — and therefore the grid leaf inside
        ``out.obs`` — is stale at the logged cells: call
        :meth:`materialize_grid` (on the returned states) before consuming
        grids as observations; ``jax.vmap(self.step)`` parity tests compare
        materialized grids.
        """
        if not self.supports_fused_step():
            return jax.vmap(self.step)(states, actions)

        from gymca_tpu.ops.pallas_kernels import (
            windy_fused_step,
            windy_weights_from_roll,
        )

        # -- replicate the per-env key threading of step()/MDP/RepeatCA --
        carry_keys, rolls = jax.vmap(derive_step_key)(states.key)

        was_done = states.done
        a_move = actions[..., 0]
        a_shoot = actions[..., 1]

        # -- RepeatCA timing (repeat_ca.py:57-64 semantics, max_repeats==1) --
        time_taken = (
            self._move_timings[a_move] + self._shoot_timings[a_shoot] + self._t_env_any
        )
        accu = states.context["time"] + time_taken
        frac, repeats = jnp.modf(accu)
        do_ca = (repeats >= 1.0) & jnp.logical_not(was_done)

        # -- Move (deterministic scalar path) --
        new_position = move_position(
            states.context["position"], a_move, self.nrows, self.ncols,
            self.move.drow, self.move.dcol,
        )

        weights = windy_weights_from_roll(self._wind, rolls)
        shoot = a_shoot.astype(TYPE_INT) * jnp.logical_not(was_done).astype(TYPE_INT)

        # -- Modify resolution (XLA side): one (N,) single-cell gather is
        # ~7 ns/env, vs ~150 ns/env for the kernel's eager tile RMW.  A
        # modify-only env hits iff its target cell is a tree AND no pending
        # logged edit already emptied that cell.
        K = self._edit_log_k
        log = states.context["edit_log"]
        log_cnt = states.context["edit_count"]
        n = states.grid.shape[0]
        env_ids = jnp.arange(n)
        r_i = new_position[..., 0].astype(jnp.int32)
        c_i = new_position[..., 1].astype(jnp.int32)
        rowcol = r_i | (c_i << 16)
        cur = states.grid[env_ids, r_i, c_i].astype(jnp.int32)
        is_modify = jnp.logical_not(do_ca) & (shoot > 0)
        if K:
            kidx = jnp.arange(K, dtype=jnp.int32)[None, :]
            valid = kidx < log_cnt[:, None]
            pending = jnp.any((log == rowcol[:, None]) & valid, axis=-1)
        else:
            pending = jnp.zeros((n,), bool)
        hit_mod = is_modify & (cur == self._tree) & jnp.logical_not(pending)
        can_log = hit_mod & (log_cnt < K)
        overflow = hit_mod & jnp.logical_not(can_log)

        # Kernel classes: CA envs (shot handled in-kernel on the new grid)
        # and eager-modify envs (log-overflow only; normally zero).
        params = jnp.stack(
            [
                do_ca.astype(TYPE_INT),
                r_i.astype(TYPE_INT),
                c_i.astype(TYPE_INT),
                jnp.where(do_ca, shoot, overflow.astype(TYPE_INT)),
            ],
            axis=-1,
        )

        new_grid, counts = windy_fused_step(
            states.grid,
            weights,
            params,
            log,
            log_cnt,
            empty=self._empty,
            tree=self._tree,
            fire=self._fire,
            interpret=interpret,
            stencil=stencil,
        )
        new_grid = new_grid.astype(states.grid.dtype)

        # Log update (after the kernel consumed the old log): CA envs replay
        # + clear; modify envs append their hit (unless overflowed: the
        # kernel already wrote that cell eagerly).
        if K:
            onehot = (kidx == log_cnt[:, None]) & can_log[:, None]
            new_log = jnp.where(do_ca[:, None], 0, jnp.where(onehot, rowcol[:, None], log))
            new_log_cnt = jnp.where(do_ca, 0, log_cnt + can_log.astype(jnp.int32))
        else:
            new_log, new_log_cnt = log, log_cnt

        # Kernel counts are defined only where it did work (sparse contract);
        # reconcile skipped/modify envs from the carried context here, where
        # it is vector math instead of per-env scalar-core work.
        hit_now = jnp.where(do_ca, counts[..., 2] > 0, hit_mod)
        hit_i = jnp.where(hit_mod, 1, 0).astype(TYPE_INT)
        t_i = jnp.where(
            do_ca, counts[..., 0],
            states.context["tree_count"].astype(jnp.int32) - hit_i,
        ).astype(TYPE_INT)
        f_i = jnp.where(
            do_ca, counts[..., 1], states.context["fire_count"].astype(jnp.int32)
        ).astype(TYPE_INT)
        t = t_i.astype(TYPE_BOX)
        f = f_i.astype(TYPE_BOX)
        # done envs keep their frozen (stale) hit flag, matching the
        # context-freeze semantics of CAEnvCore.step
        hit = jnp.where(was_done, states.context["hit"], hit_now)

        reward = jnp.where(
            was_done, jnp.asarray(0.0, TYPE_BOX), -(f / jnp.maximum(t + f, 1.0))
        )
        done = jnp.logical_or(was_done, f == 0.0)

        new_context = {
            "wind": states.context["wind"],
            "position": jnp.where(was_done[..., None], states.context["position"],
                                  new_position),
            "time": jnp.where(was_done, states.context["time"], frac.astype(TYPE_BOX)),
            "hit": hit,
            "pos_fire": states.context["pos_fire"],
            "tree_count": t_i,
            "fire_count": f_i,
            "edit_log": new_log,
            "edit_count": new_log_cnt,
        }
        new_states = EnvState(
            grid=new_grid,
            context=new_context,
            key=carry_keys,
            done=done,
            steps_elapsed=states.steps_elapsed + jnp.where(was_done, 0, 1),
            reward_accumulated=states.reward_accumulated + reward,
        )
        out = StepOutput(
            obs=self.observe(new_states),
            reward=reward,
            terminated=done,
            truncated=jnp.zeros_like(done),
            info={"hit": hit},
        )
        return new_states, out

    def materialize_grid(self, states: EnvState) -> jnp.ndarray:
        """Flush pending deferred Modify writes into the grids (read path for
        the fused batched step's write-back log; see :meth:`step_batched`).

        Returns grids bit-identical to what ``jax.vmap(self.step)`` would
        have produced eagerly.  Off the hot path by design — rendering,
        tests, and checkpoint export call this; the training/bench loop
        never does."""
        K = self._edit_log_k
        log = states.context.get("edit_log")
        if K == 0 or log is None:
            return states.grid
        cnt = states.context["edit_count"]
        empty = self._empty

        def apply_one(grid, log, cnt):
            def body(g, args):
                wrd, k = args
                r, c = wrd & 0xFFFF, wrd >> 16
                v = jnp.where(k < cnt, jnp.asarray(empty, g.dtype), g[r, c])
                return g.at[r, c].set(v), None

            g, _ = jax.lax.scan(
                body, grid, (log, jnp.arange(K, dtype=jnp.int32))
            )
            return g

        if states.grid.ndim == 2:  # single env
            return apply_one(states.grid, log, cnt)
        return jax.vmap(apply_one)(states.grid, log, cnt)

    def _award(self, grid, context):
        """-(f / (t + f)) (reference bulldozer.py:180-213), from the counts
        maintained in the context by the MDP."""
        t = context["tree_count"].astype(TYPE_BOX)
        f = context["fire_count"].astype(TYPE_BOX)
        return -(f / jnp.maximum(t + f, 1.0))

    def _is_done(self, grid, context):
        return context["fire_count"] == 0

    def _report(self, grid, context):
        return {"hit": context["hit"]}


class ForestFireBulldozerEnv(GymCAEnv):
    """Classic gymnasium-API Bulldozer (drop-in for the reference env)."""

    def __init__(self, nrows, ncols, seed: Optional[int] = None, **kwargs):
        kwargs.pop("debug", None)
        core = BulldozerCore(nrows, ncols, **kwargs)
        super().__init__(core, seed=seed)
        self.title = core.title
        self._empty, self._tree, self._fire = core._empty, core._tree, core._fire

    def render(self):
        from gymca_tpu.utils.render import render_bulldozer

        return render_bulldozer(self)
