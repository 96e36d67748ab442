"""Multi-host distribution: a REAL 2-process jax.distributed CPU cluster.

The JAX-idiomatic fake multi-host (no TPU pod needed): two subprocesses,
each with 2 virtual CPU devices, joined through a localhost coordinator —
exercising maybe_initialize(), the global mesh, multi-host shard_batch
(make_array_from_process_local_data) and a psum across process boundaries.

Reference analogue: Accelerate's NCCL process group
(/root/reference/train_stablemtl.py:176-184).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["STABLEMTL_REPO"])

from stablemtl_tpu.parallel.distributed import (
    is_main_process, loader_shard, maybe_initialize, process_count)

assert maybe_initialize(), "env-gated init did not trigger"
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

pi = jax.process_index()
assert loader_shard() == (pi, 2)
assert is_main_process() == (pi == 0)

from stablemtl_tpu.parallel import MeshConfig, make_mesh, shard_batch

mesh = make_mesh(MeshConfig())  # 4x1 data mesh over both processes
assert dict(mesh.shape) == {"data": 4, "model": 1}

# global batch of 8 rows = rows [0..8); this process holds its half
local = np.arange(8, dtype=np.float32).reshape(8, 1)[pi * 4:(pi + 1) * 4]
batch = {"x": local, "task_idx": np.asarray(3, np.int32)}
with mesh:
    placed = shard_batch(batch, mesh)
    assert placed["x"].shape == (8, 1), placed["x"].shape

    @jax.jit
    def global_mean(b):
        return b["x"].mean() + 0.0 * b["task_idx"]

    m = float(global_mean(placed))
# mean over the FULL global batch (0..7) -> 3.5, identical on both processes
assert abs(m - 3.5) < 1e-6, m

# a collective that actually crosses the process boundary
from functools import partial
from jax.experimental.shard_map import shard_map

@jax.jit
@partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
def allsum(x):
    return jax.lax.psum(x.sum(), "data")

s = float(allsum(placed["x"][:, 0]))
assert abs(s - 28.0) < 1e-6, s
print(f"MULTIHOST_OK process={pi} mean={m} sum={s}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "STABLEMTL_REPO": REPO,
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "STABLEMTL_COORDINATOR": f"127.0.0.1:{port}",
            "STABLEMTL_NUM_PROCESSES": "2",
            "STABLEMTL_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_OK process={pid}" in out, out
