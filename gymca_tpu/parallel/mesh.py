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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated_sharding",
           "shard_env_batch", "initialize_distributed"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (no-op on single host).

    On TPU pods, ``jax.distributed.initialize()`` autodetects everything.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data mesh over the first ``num_devices`` devices (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (env-batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place every array leaf with a leading env axis on the data axis.

    Scalar / sub-batch leaves (e.g. shared context) are replicated.
    """
    n = mesh.shape[axis_name]
    data = data_sharding(mesh, axis_name)
    repl = replicated_sharding(mesh)

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] >= n:
            return jax.device_put(x, data)
        return jax.device_put(x, repl)

    return jax.tree.map(place, tree)
