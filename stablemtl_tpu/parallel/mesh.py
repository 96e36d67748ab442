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
    slowdown that looks like working code)."""
    data = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    n_data = mesh.shape[DATA_AXIS]

    def place(path, x):
        # metadata only — np.asarray on an already-device-resident leaf
        # would force a device->host fetch through the tunnel first
        shape = np.shape(x)
        if len(shape) == 0:
            return jax.device_put(x, rep)
        if shape[0] == 0 or shape[0] % n_data != 0:
            raise ValueError(
                f"shard_batch: leaf {jax.tree_util.keystr(path)} has leading "
                f"dim {shape[0]}, not divisible by the mesh data axis "
                f"({n_data}); this would silently replicate instead of "
                f"sharding. Fix the batch size (or pass a 0-d scalar for "
                f"per-batch values like task_idx).")
        return jax.device_put(x, data)

    return jax.tree_util.tree_map_with_path(place, batch)
