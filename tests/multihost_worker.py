"""Worker for the genuine 2-process multi-host test (run via subprocess).

Each process owns 4 virtual CPU devices (``--xla_force_host_platform_device_
count=4``); together they form an 8-device, 2-host runtime connected through
``jax.distributed`` with gloo CPU collectives.  Exercises:

* ``initialize_distributed`` + ``make_host_device_mesh`` (('host','device'));
* env-batch sharding across PROCESS boundaries (``shard_env_batch`` building
  global arrays from process-local slices);
* a vmapped Bulldozer step on the cross-host batch with a global reward
  reduction (psum crossing DCN);
* an explicit shard_map psum over both mesh axes.

Prints one ``RESULT {...}`` JSON line the parent test compares across ranks.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    pid = int(sys.argv[1])
    coord = sys.argv[2]

    # ``import gymca_tpu`` builds module-level jnp constants, which
    # initializes the XLA backend — jax.distributed must come first.  Load
    # the mesh module standalone (same file, no package __init__) so
    # ``initialize_distributed`` itself is what brings the cluster up.
    import importlib.util

    mesh_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "gymca_tpu", "parallel", "mesh.py",
    )
    spec = importlib.util.spec_from_file_location("_gymca_mesh_boot", mesh_path)
    mesh_boot = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mesh_boot)
    mesh_boot.initialize_distributed(coord, 2, pid)

    from gymca_tpu.parallel.mesh import (
        is_coordinator,
        make_host_device_mesh,
        make_mesh,
        shard_env_batch,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert is_coordinator() == (pid == 0)

    # -- (a) 2-D host/device mesh + psum over both axes --------------------
    mesh2 = make_host_device_mesh()
    mesh_shape = dict(mesh2.shape)
    spec_hd = P(("host", "device"))
    local = np.arange(8, dtype=np.float32)[4 * pid : 4 * pid + 4]
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh2, spec_hd), local, (8,)
    )

    from gymca_tpu.parallel.sharded import shard_map

    total_hd = shard_map(
        lambda v: lax.psum(jnp.sum(v), ("host", "device")),
        mesh=mesh2, in_specs=spec_hd, out_specs=P(),
    )(x)
    total_hd = float(total_hd)

    # -- (b) cross-host env batch: vmapped Bulldozer step ------------------
    from gymca_tpu.envs.bulldozer import BulldozerCore

    core = BulldozerCore(16, 16)
    keys = jax.random.split(jax.random.key(7), 8)
    states = jax.vmap(core.initial_state)(keys)
    actions = jnp.tile(jnp.asarray([[1, 1]], jnp.int32), (8, 1))

    @jax.jit
    def step_sum(s, a):
        s2, out = jax.vmap(core.step)(s, a)
        return jnp.sum(out.reward), jnp.sum(s2.grid == core._tree)

    expect_r, expect_t = step_sum(states, actions)  # local, unsharded
    expect_r, expect_t = float(expect_r), int(expect_t)

    mesh1 = make_mesh()  # 1-D data mesh over all 8 global devices
    states_sh = shard_env_batch(mesh1, states)
    actions_sh = shard_env_batch(mesh1, actions)
    got_r, got_t = step_sum(states_sh, actions_sh)
    got_r, got_t = float(got_r), int(got_t)

    assert got_t == expect_t, (got_t, expect_t)
    assert abs(got_r - expect_r) < 1e-5, (got_r, expect_r)

    print("RESULT " + json.dumps({
        "pid": pid,
        "mesh": mesh_shape,
        "psum_hd": total_hd,
        "reward_sum": round(got_r, 6),
        "tree_total": got_t,
    }), flush=True)


if __name__ == "__main__":
    main()
