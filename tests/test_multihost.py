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


TRAIN_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["STABLEMTL_REPO"])

from stablemtl_tpu.parallel.distributed import maybe_initialize

assert maybe_initialize(), "env-gated init did not trigger"
import jax
import jax.numpy as jnp
import numpy as np

assert jax.process_count() == 2 and jax.device_count() == 4

import __graft_entry__ as graft
from stablemtl_tpu.checkpoint import CheckpointManager
from stablemtl_tpu.parallel import MeshConfig, make_mesh, shard_batch
from stablemtl_tpu.parallel.sharded_train import (make_sharded_train_step,
                                                  shard_train_state)
from stablemtl_tpu.train_state import OptimizerConfig, create_train_state

pi = jax.process_index()
mesh = make_mesh(MeshConfig())        # data=4 over both processes

# identical seeded init on every process (the real multi-host contract:
# same params everywhere before sharding)
pipe = graft._build_pipeline("nano", multi_stream=True, image_hw=(16, 16))
state = create_train_state(pipe.unet_params,
                           OptimizerConfig(use_schedule=True))
state = shard_train_state(state, mesh, zero1=True)
step = make_sharded_train_step(pipe, mesh, base_seed=0, zero1=True,
                               donate=True)


def make_batch(i):
    # GLOBAL batch built identically everywhere; each process passes its
    # local row shard (shard_batch assembles the global array)
    r = np.random.RandomState(i)
    B = 4
    rgb = r.uniform(-1, 1, (B, 16, 16, 3)).astype(np.float32)
    tgt = r.uniform(-1, 1, (B, 16, 16, 3)).astype(np.float32)
    lo, hi = pi * 2, pi * 2 + 2
    return {
        "rgb_norm": rgb[lo:hi], "rgb_next_norm": rgb[lo:hi],
        "target_3ch": tgt[lo:hi],
        "valid_mask": np.ones((2, 16, 16, 1), bool),
        "task_idx": np.asarray(i % 7, np.int32),
    }


ckpt_dir = os.environ["STABLEMTL_CKPT_DIR"]
with mesh:
    state, metrics = step(state, shard_batch(make_batch(0), mesh))
    pre = float(metrics["loss"])
    # collective orbax save: every process writes its addressable shards
    # (ZeRO-1 moments are sharded across the process boundary)
    ckpt = CheckpointManager(ckpt_dir)
    ckpt.save(state, meta={"step": int(state.step)})
    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=x.sharding), state)
    restored = ckpt.restore(template)
    assert int(restored.step) == 1, int(restored.step)
    # post-restore step reuses the compiled executable (same shardings)
    restored, metrics = step(restored, shard_batch(make_batch(1), mesh))
    post = float(metrics["loss"])
assert np.isfinite(pre) and np.isfinite(post), (pre, post)
print(f"MULTIHOST_TRAIN_OK process={pi} pre={pre:.6f} post={post:.6f}",
      flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(tmp_path, source: str, timeout: int, extra_env=None):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(source)
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
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
    return outs


def test_two_process_cpu_cluster(tmp_path):
    outs = _run_cluster(tmp_path, WORKER, timeout=600)
    for pid, out in enumerate(outs):
        assert f"MULTIHOST_OK process={pid}" in out, out


def test_two_process_sharded_train_and_checkpoint(tmp_path):
    """One real make_sharded_train_step micro-step on the 2-process mesh,
    a collective orbax save (each process writes its ZeRO-1 shards), an
    abstract-template restore, and a post-restore step — asserting the
    loss is identical across processes at both points (VERDICT r4 #5).
    Reference analogue: DDP training + resume, train_stablemtl.py:176-209.
    """
    ckpt_dir = tmp_path / "ckpt"
    outs = _run_cluster(tmp_path, TRAIN_WORKER, timeout=1500,
                        extra_env={"STABLEMTL_CKPT_DIR": str(ckpt_dir)})
    vals = []
    for pid, out in enumerate(outs):
        line = [l for l in out.splitlines()
                if l.startswith(f"MULTIHOST_TRAIN_OK process={pid}")]
        assert line, out
        parts = dict(kv.split("=") for kv in line[0].split()[1:])
        vals.append((float(parts["pre"]), float(parts["post"])))
    # bit-identical replicated loss on both processes, pre and post restore
    assert vals[0] == vals[1], vals
