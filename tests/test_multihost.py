"""Genuine 2-process multi-host test (SURVEY §4: "multi-host tests runnable
on CPU via jax.distributed + fake meshes" — machinery the reference lacks).

Spawns two REAL OS processes, each with 4 virtual CPU devices, connected by
``jax.distributed.initialize`` over a local TCP coordinator with gloo CPU
collectives.  The worker (``tests/multihost_worker.py``) builds the
('host','device') mesh, shards an env batch across the process boundary,
steps it, and reduces globally; both ranks must report identical results.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

    env = dict(os.environ)
    # the worker is executed by script path, so only tests/ lands on its
    # sys.path — make the repo root importable regardless of how (or from
    # where) the parent pytest was launched
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )
    env.pop("JAX_PLATFORM_NAME", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # ensure each worker re-initializes jax fresh (no inherited backends);
    # in particular the box's sitecustomize registers a TPU PJRT plugin at
    # interpreter startup when PALLAS_AXON_POOL_IPS is set, which would
    # initialize the backend before jax.distributed.initialize can run.
    for var in ("JAX_NUM_PROCESSES", "PALLAS_AXON_POOL_IPS",
                "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-4000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"rank {pid} printed no RESULT:\n{out[-2000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))

    r0, r1 = results
    assert r0["mesh"] == {"host": 2, "device": 4}
    assert r1["mesh"] == r0["mesh"]
    assert r0["psum_hd"] == 28.0  # sum(range(8)) across both hosts
    assert r1["psum_hd"] == r0["psum_hd"]
    assert r0["reward_sum"] == r1["reward_sum"]
    assert r0["tree_total"] == r1["tree_total"] > 0
