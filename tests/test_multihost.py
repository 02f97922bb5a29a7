"""Multi-host smoke test (round-2 VERDICT item 8): two OS processes form a
jax.distributed job on CPU, build the global mesh through
parallel/multihost.py, and run a psum'd shard_map step across processes.

This exercises the cross-process path the single-browser reference never
had (SURVEY §5): coordinator handshake, global device enumeration, and a
collective that crosses process boundaries."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fspt_tpu.parallel import multihost

port, pid = sys.argv[1], int(sys.argv[2])
multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()          # 2 per process
assert multihost.is_coordinator() == (pid == 0)

mesh = multihost.global_mesh()
assert mesh.devices.size == 4

@jax.jit
def psum_step(x):
    return jax.shard_map(lambda v: jax.lax.psum(v, "rays"), mesh=mesh,
                         in_specs=P("rays"), out_specs=P())(x)

x = jnp.arange(4, dtype=jnp.float32)
out = psum_step(jax.device_put(
    x, jax.sharding.NamedSharding(mesh, P("rays"))))
np.testing.assert_allclose(np.asarray(out), 6.0)
print(f"proc {pid} OK")
"""


def test_two_process_cpu_smoke(tmp_path):
    if os.environ.get("FSPT_TEST_TPU"):
        pytest.skip("multi-process smoke is a CPU-backend test")
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    portno = port.getsockname()[1]
    port.close()
    env = dict(os.environ,
               PYTHONPATH=os.pathsep.join(
                   [os.path.dirname(os.path.dirname(__file__))]
                   + sys.path))
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(portno), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
