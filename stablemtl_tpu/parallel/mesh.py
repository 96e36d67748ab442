"""Device mesh and sharding policy.

The reference's only distribution strategy is DDP over NCCL via HF Accelerate
(SURVEY.md §2 parallelism inventory; /root/reference/train_stablemtl.py:176-184).
The TPU-native equivalent is declarative: one `jax.sharding.Mesh`, parameters
replicated, the batch sharded over the `data` axis, and XLA inserting the
gradient all-reduce over ICI — no hand-written collectives.

A second (trivial, size-1 by default) `model` axis is kept in the mesh so
tensor-parallel sharding rules can be layered on later without re-plumbing
call sites.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1    # -1 = all remaining devices
    model: int = 1


def make_mesh(config: MeshConfig = MeshConfig(),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build the (data, model) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, config.model)
    data = config.data if config.data > 0 else n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not cover {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def host_local_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Mesh over the first n local devices (testing convenience)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return make_mesh(MeshConfig(), devs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict on the mesh: arrays with a leading batch axis
    are sharded over `data`; scalars (e.g. task_idx) are replicated.

    A non-scalar whose leading dim is not divisible by the data-axis size is
    an error (it would silently replicate and lose data parallelism — an 8x
    slowdown that looks like working code).

    Multi-host: when the mesh spans multiple processes, each process passes
    only its LOCAL slice of the global batch (the loader's shard) and the
    global array is assembled with `jax.make_array_from_process_local_data`
    — the divisibility check is then against the local data-axis extent."""
    data = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    multihost = jax.process_count() > 1
    if multihost:
        # data-axis extent addressable by THIS process: local devices
        # divided by the model-axis size (model-axis peers share batch rows)
        n_local = sum(1 for d in mesh.devices.flat
                      if d.process_index == jax.process_index())
        n_data = max(1, n_local // mesh.shape[MODEL_AXIS])
    else:
        n_data = mesh.shape[DATA_AXIS]

    def place(path, x):
        # metadata only — np.asarray on an already-device-resident leaf
        # would force a device->host fetch through the tunnel first
        shape = np.shape(x)
        if len(shape) == 0:
            if multihost:
                return jax.make_array_from_process_local_data(
                    rep, np.asarray(x))
            return jax.device_put(x, rep)
        if shape[0] == 0 or shape[0] % n_data != 0:
            raise ValueError(
                f"shard_batch: leaf {jax.tree_util.keystr(path)} has leading "
                f"dim {shape[0]}, not divisible by the "
                f"{'process-local ' if multihost else ''}mesh data axis "
                f"({n_data}); this would silently replicate instead of "
                f"sharding. Fix the batch size (or pass a 0-d scalar for "
                f"per-batch values like task_idx).")
        if multihost:
            return jax.make_array_from_process_local_data(
                data, np.asarray(x))
        return jax.device_put(x, data)

    return jax.tree_util.tree_map_with_path(place, batch)
