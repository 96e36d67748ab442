"""Tensor-parallel parameter sharding policy (GSPMD-style).

The reference has no tensor parallelism (its only strategy is DDP,
SURVEY.md §2); the UNet fits replicated on one chip. This module exists
for the TPU-native scaling story: shard the transformer projection
weights over the mesh's `model` axis and let GSPMD propagate/insert the
collectives — no hand-written comms, composable with data parallelism
and ZeRO-1 (anything TP leaves replicated can still be ZeRO-sharded).

Policy (Megatron-style column/row pairing, applied by param path):
- attention to_q/to_k/to_v kernels [din, dout]:   shard dout ("model")
  attention to_out_0 kernel:                      shard din
- GEGLU ff net_0/proj kernel:                     shard dout
  ff net_2 kernel:                                shard din
- cross-task banks [T, din, dout] (task_to_{k,v}_fc1 / q net_0..k):
  first/hidden layers shard dout, the final fc2 / q out layer shards din
- biases of column-parallel layers:               shard their only axis
- everything else (convs, norms, embeddings):     replicated

Correctness does not depend on the pairing (GSPMD reshards as needed);
the pairing just keeps the all-reduces where a Megatron layout would put
them.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# column-parallel (shard output features) / row-parallel (shard input
# features) module names, matched against the second-to-last path entry
_COL_MODULES = ("to_q", "to_k", "to_v", "proj", "net_0", "proj_in")
_ROW_MODULES = ("to_out_0", "net_2", "proj_out")

# cross-task bank leaf names [T, din, dout]: column / row parallel
_COL_BANKS = ("task_to_k_fc1_kernel", "task_to_v_fc1_kernel",
              "task_to_q_net_0_kernel", "task_to_q_net_4_kernel")
_ROW_BANKS = ("task_to_k_fc2_kernel", "task_to_v_fc2_kernel",
              "task_to_q_net_2_kernel", "task_to_q_net_6_kernel")
_COL_BANK_BIASES = tuple(n.replace("_kernel", "_bias") for n in _COL_BANKS)


def path_names(path) -> Tuple[str, ...]:
    """Stringified key path (DictKey/GetAttrKey/SequenceKey tolerant)."""
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return tuple(out)


def tp_spec(names: Sequence[str], shape, mesh: Mesh) -> P:
    """PartitionSpec over the `model` axis for one parameter."""
    n = mesh.shape.get(MODEL_AXIS, 1)
    if n <= 1 or not names:
        return P()
    leaf = names[-1]
    mod = names[-2] if len(names) >= 2 else ""

    def ok(axis):
        return shape[axis] % n == 0

    if leaf == "kernel" and len(shape) == 2:
        if mod in _COL_MODULES and ok(1):
            return P(None, MODEL_AXIS)
        if mod in _ROW_MODULES and ok(0):
            return P(MODEL_AXIS, None)
    if leaf == "bias" and len(shape) == 1 and mod in _COL_MODULES and ok(0):
        return P(MODEL_AXIS)
    if leaf in _COL_BANKS and len(shape) == 3 and ok(2):
        return P(None, None, MODEL_AXIS)
    if leaf in _ROW_BANKS and len(shape) == 3 and ok(1):
        return P(None, MODEL_AXIS, None)
    if leaf in _COL_BANK_BIASES and len(shape) == 2 and ok(1):
        return P(None, MODEL_AXIS)
    return P()


def tp_param_specs(params, mesh: Mesh):
    """Pytree of PartitionSpecs for a flax param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: tp_spec(path_names(path), x.shape, mesh), params)


def tp_param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), tp_param_specs(params),
        is_leaf=lambda s: isinstance(s, P))


def opt_leaf_param_names(path) -> Optional[Tuple[str, ...]]:
    """For an optimizer-state leaf, the mirrored parameter path (the key
    segments after the LAST 'params' entry), or None if there is none —
    optax moment trees (adam mu/nu, MultiSteps acc_grads, ...) replicate
    the param tree under their own wrappers."""
    names = path_names(path)
    if "params" not in names:
        return None
    i = len(names) - 1 - names[::-1].index("params")
    tail = names[i + 1:]
    return tuple(tail) if tail else None
