"""Device mesh helpers.

The reference only gestures at multi-device execution (dead ``NamedSharding``
scaffolding behind ``SHOULD_SHARD = False``, ``jax_ppo.py:80-81, 792-853``).
Here the mesh is first-class: the env batch shards over a ``('data',)`` axis
(ICI within a slice, DCN across hosts via ``jax.distributed``), model params
replicate, and PPO gradients all-reduce with ``psum``/``pmean`` over the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_2d_mesh", "make_host_device_mesh",
           "is_coordinator", "data_sharding", "replicated_sharding",
           "shard_env_batch", "initialize_distributed"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (no-op on single host).

    On TPU pods, ``jax.distributed.initialize()`` autodetects everything.
    On CPU (tests / local clusters) pass the coordinator explicitly and set
    ``jax_cpu_collectives_implementation = "gloo"`` first so cross-process
    psum/pmean have a backend.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def is_coordinator() -> bool:
    """True on the process that owns logging / checkpoint writes (host 0)."""
    return jax.process_index() == 0


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh over the first ``num_devices`` devices (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_2d_mesh(
    data: int, space: int, axis_names: tuple = ("data", "space"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D ``(data, space)`` mesh: env batches shard over the leading axis,
    each env's grid rows over the trailing axis (see
    ``parallel/spatial_env.py``'s batch x spatial composition)."""
    devices = list(devices if devices is not None else jax.devices())
    assert data * space <= len(devices), (data, space, len(devices))
    arr = np.asarray(devices[: data * space]).reshape(data, space)
    return Mesh(arr, axis_names)


def make_host_device_mesh(axis_names: tuple = ("host", "device")) -> Mesh:
    """2-D ``(host, device)`` mesh: the leading axis crosses processes (DCN),
    the trailing axis stays within one process's local chips (ICI).

    Shard env batches with ``P(('host', 'device'))`` so the global batch
    splits host-major; collectives that reduce over ``'device'`` alone ride
    ICI, full reductions cross DCN once.  The reference has no multi-host
    notion at all (SURVEY §2.10) — this is the design-new scale-out axis.
    """
    procs = jax.process_count()
    devs = jax.devices()
    per_host = len(devs) // procs
    grouped = [[] for _ in range(procs)]
    for d in devs:
        grouped[d.process_index].append(d)
    assert all(len(g) == per_host for g in grouped), (
        "uneven local device counts across processes"
    )
    return Mesh(np.asarray(grouped), axis_names)


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (env-batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place every array leaf with a leading env axis on the data axis.

    Scalar / sub-batch leaves (e.g. shared context) are replicated.  Works
    across processes: when the mesh spans hosts, every process is expected to
    hold the SAME globally-computed batch (deterministic reset from a shared
    key), and this carves out its local slice with
    ``jax.make_array_from_process_local_data``.
    """
    n = mesh.shape[axis_name]
    data = data_sharding(mesh, axis_name)
    repl = replicated_sharding(mesh)
    multiproc = jax.process_count() > 1

    def place(x):
        typed_key = hasattr(x, "dtype") and jnp.issubdtype(
            x.dtype, jax.dtypes.prng_key
        )
        if typed_key:
            # shard the underlying key words, then re-type
            return jax.random.wrap_key_data(
                place(jax.random.key_data(x)),
                impl=jax.random.key_impl(x),
            )
        shardable = (
            hasattr(x, "shape") and x.ndim >= 1
            and x.shape[0] % n == 0 and x.shape[0] >= n
        )
        if not shardable:
            if multiproc:
                return jax.make_array_from_process_local_data(repl, np.asarray(x))
            return jax.device_put(x, repl)
        if multiproc:
            per_proc = x.shape[0] // jax.process_count()
            lo = jax.process_index() * per_proc
            return jax.make_array_from_process_local_data(
                data, np.asarray(x[lo : lo + per_proc]), x.shape
            )
        return jax.device_put(x, data)

    return jax.tree.map(place, tree)
