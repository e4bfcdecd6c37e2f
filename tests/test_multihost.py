"""Multi-host runtime entry (parallel/multihost.py): single-process
no-op path, mesh construction, and a REAL two-process
jax.distributed.initialize rendezvous over localhost."""

import os
import socket
import subprocess
import sys

import numpy as np


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_single_process_noop():
    from metagraph_tpu.parallel import multihost
    assert multihost.initialize() is False      # no env, no args
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(__import__("jax").devices())
    assert multihost.is_primary()


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {repo!r})
import jax
from metagraph_tpu.parallel import multihost
ok = multihost.initialize(coordinator_address={addr!r},
                          num_processes=2, process_id={pid})
assert ok
assert jax.process_count() == 2
assert jax.device_count() == 4          # 2 local per process
mesh = multihost.global_mesh()
assert mesh.devices.size == 4
print("proc", {pid}, "primary:", multihost.is_primary(), flush=True)
"""


def test_two_process_initialize(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    addr = f"127.0.0.1:{free_port()}"
    # strip the axon sitecustomize (PYTHONPATH): its backend plugin
    # breaks the CPU coordination service in child processes
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_")) and k != "PYTHONPATH"}
    procs = []
    for pid in range(2):
        script = _WORKER.format(repo=repo, addr=addr, pid=pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()
    joined = "".join(outs)
    assert "proc 0 primary: True" in joined
    assert "proc 1 primary: False" in joined
