#!/usr/bin/env python
"""Run the REFERENCE trainer head-to-head on this chip.

Executes ``/root/reference``'s own ``jax_ppo.run_rollout_loop`` (the
reference's whole raison d'etre, ``jax_ppo.py:419``) unmodified except for
two import-time shims, and records its learning curve as JSON so it can be
overlaid against gymca_tpu's trainer at identical hyperparameters/seed:

* ``jax.experimental.host_callback`` was removed from modern JAX; the
  reference imports it (``jax_ppo.py:20``) but never calls it — its would-be
  users are dead debug hooks (``jax_ppo.py:28-70``).  Shimmed with no-ops.
* ``wandb`` is called UNCONDITIONALLY for video logging at iteration 5 and
  every 500 (``jax_ppo.py:1512-1520``) even though the import is gated on
  ``args.exp.track`` (``:445``) — with track=False that line is an
  UnboundLocalError.  We install a no-op fake wandb and run with track=True
  so the reference's own code path works headless.

The curve is captured by wrapping the module's SummaryWriter so every
``add_scalar`` also lands in an in-memory dict (the TB event files are
still written normally).

Usage (ours at the same config: scripts/run --size 64 --num-envs 8 ...):

    python scripts/run_reference_ppo.py --size 64 --num-envs 8 \
        --total-timesteps 2000000 --seed 7 --out docs/assets/ref_curve_64.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types
from collections import defaultdict


def install_shims():
    import jax
    import jax.experimental

    hc = types.ModuleType("jax.experimental.host_callback")
    hc.id_tap = lambda f, a, **k: a
    hc.call = lambda f, a, **k: a
    sys.modules["jax.experimental.host_callback"] = hc
    jax.experimental.host_callback = hc

    # pre-0.4.x aliases the reference still uses (jax_ppo.py:737,1064,...)
    if not hasattr(jax, "tree_leaves"):
        jax.tree_leaves = jax.tree.leaves
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map

    wandb = types.ModuleType("wandb")

    class _Cfg:
        def update(self, *a, **k):
            pass

    class _Video:
        def __init__(self, *a, **k):
            pass

    wandb.config = _Cfg()
    wandb.init = lambda *a, **k: None
    wandb.log = lambda *a, **k: None
    wandb.finish = lambda *a, **k: None
    wandb.Video = _Video
    sys.modules["wandb"] = wandb


def import_patched_jax_ppo():
    """Import the reference trainer with ONE mechanical bug fix.

    At head, ``run_rollout_loop`` initializes network/actor/critic on
    ``jnp.expand_dims(env.observation_space.sample(), 0)`` — shape
    ``(1, num_envs, H, W, C)`` (``jax_ppo.py:716-733``; the advanced env's
    observation space is already batched, ``advanced_bulldozer.py:779-902``)
    — while every rollout apply sees ``(num_envs, H, W, C)``
    (``jax_ppo.py:875-878``).  The Dense layer after flatten therefore can
    never match (ScopeParamShapeError) and the trainer cannot start at ANY
    grid size.  Minimal fix: initialize on the batched sample directly.
    Everything else runs unmodified.
    """
    import importlib.util

    path = "/root/reference/gym_cellular_automata/agents/jax_ppo.py"
    with open(path) as f:
        src = f.read()
    bug = "grid_sample = jnp.expand_dims(grid_sample, 0)"
    n = src.count(bug)
    assert n == 3, f"expected 3 init-shape bug sites, found {n}"
    src = src.replace(
        bug, "pass  # head-to-head patch: obs-space sample is already batched"
    )
    spec = importlib.util.spec_from_loader(
        "gym_cellular_automata.agents.jax_ppo", loader=None, origin=path
    )
    mod = importlib.util.module_from_spec(spec)
    mod.__file__ = path
    sys.modules["gym_cellular_automata.agents.jax_ppo"] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--num-envs", type=int, default=8)
    p.add_argument("--total-timesteps", type=int, default=2_000_000)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--speed-multiplier", type=float, default=1.0)
    p.add_argument("--enable-extensions", action="store_true")
    p.add_argument("--out", type=str, default="docs/assets/ref_curve.json")
    p.add_argument("--workdir", type=str, default="/tmp/ref_ppo_run",
                   help="cwd for the reference's runs/ TB logs + checkpoints")
    cli = p.parse_args()

    install_shims()
    sys.path.insert(0, "/root/reference")

    out_path = os.path.abspath(cli.out)
    os.makedirs(cli.workdir, exist_ok=True)
    os.chdir(cli.workdir)

    import jax

    import gym_cellular_automata as gymca  # noqa: F401  (registers envs)
    jp = import_patched_jax_ppo()
    from gym_cellular_automata.agents.args import (
        Args,
        EnvArgs,
        ExperimentArgs,
        PPOArgs,
        VisualizationArgs,
    )

    scalars = defaultdict(list)
    RealWriter = jp.SummaryWriter
    partial_path = out_path + ".partial"
    counter = {"n": 0}

    def dump(final=False):
        blob = {
            "framework": "reference",
            "env": "AdvancedForestFireBulldozer",
            "size": cli.size,
            "num_envs": cli.num_envs,
            "total_timesteps": cli.total_timesteps,
            "seed": cli.seed,
            "enable_extensions": cli.enable_extensions,
            "partial": not final,
            "scalars": {k: v for k, v in scalars.items()},
        }
        with open(partial_path, "w") as f:
            json.dump(blob, f)
        return blob

    class RecordingWriter(RealWriter):
        def add_scalar(self, tag, value, step=None, *a, **k):
            try:
                scalars[tag].append([int(step), float(value)])
            except (TypeError, ValueError):
                pass
            # periodic crash/stall-proof dump (the tunneled chip has been
            # observed to hang multi-hour runs mid-flight)
            counter["n"] += 1
            if counter["n"] % 500 == 0:
                dump()
            return super().add_scalar(tag, value, step, *a, **k)

    jp.SummaryWriter = RecordingWriter

    args = Args(
        ppo=PPOArgs(),
        env=EnvArgs(
            env_id="AdvancedForestFireBulldozer",
            num_envs=cli.num_envs,
            size=cli.size,
            speed_multiplier=cli.speed_multiplier,
            use_hidden=True,
            enable_extensions=cli.enable_extensions,
        ),
        viz=VisualizationArgs(),
        exp=ExperimentArgs(
            seed=cli.seed,
            track=True,  # fake wandb; see module docstring
            total_timesteps=cli.total_timesteps,
            description="headtohead",
        ),
    )

    key = jax.random.key(args.exp.seed)
    key, subkey = jax.random.split(key)
    ProtoEnv = gymca.prototypes[2]
    env = ProtoEnv(
        nrows=args.env.size,
        ncols=args.env.size,
        key=key,
        num_envs=args.env.num_envs,
        speed_move=args.env.speed_move * args.env.speed_multiplier,
        speed_act=0.03 * args.env.speed_multiplier,
        use_hidden=args.env.use_hidden,
        middle_fire=False,
        enable_extensions=args.env.enable_extensions,
    )

    print(f"[ref-ppo] device={jax.devices()[0].device_kind} "
          f"size={cli.size} envs={cli.num_envs} "
          f"iters={args.num_iterations} seed={cli.seed}", flush=True)
    t0 = time.time()
    jp.run_rollout_loop(env, args, key)
    elapsed = time.time() - t0

    result = dump(final=True)
    result["elapsed_s"] = elapsed
    result["sps"] = cli.total_timesteps / elapsed
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"[ref-ppo] done in {elapsed:.0f}s "
          f"({cli.total_timesteps / elapsed:.0f} SPS) -> {out_path}",
          flush=True)


if __name__ == "__main__":
    main()
