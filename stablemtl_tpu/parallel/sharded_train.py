"""Explicitly-sharded training step: pjit with declared in/out shardings.

The plain `make_train_step` relies on sharding propagation from the batch
(correct for pure data parallelism). This module makes the layout explicit
and adds ZeRO-1-style optimizer-state sharding over the `data` axis — the
TPU-native answer to training the full multi-stream model on small-HBM
chips (params ~0.9B x2 UNets + Adam moments exceed one v5e's 16 GB; the
reference instead assumes 8x A100-80GB, config/accelerator/multigpus_8.yaml).

Layout:
- batch: leading axis over `data`
- params / frozen: replicated
- Adam moments (mu, nu): sharded over `data` on the largest divisible axis
  (XLA inserts all-gathers around the update; memory drops ~2x params per
  moment tensor per chip)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import StableMTLPipeline
from ..train_state import TrainState, frozen_params_of, make_train_step
from .mesh import DATA_AXIS, batch_sharding, replicated_sharding
from .tensor_parallel import (
    opt_leaf_param_names,
    path_names,
    tp_spec,
)


# Leaves below this many elements are replicated instead of ZeRO-1 sharded:
# sharding a (320,)-bias moment over 8 chips saves ~KB of HBM but costs an
# all-gather EVERY step — across the ~700 leaves of the UNet the per-leaf
# collectives dominate step latency (measured: the virtual-8-device dryrun
# step dropped ~4x when small leaves stopped sharding). 64k elements = 256KB
# f32, the point where the memory saved starts to matter on a 16G chip.
ZERO1_MIN_SIZE = 65536


def _zero1_sharding_for(x, mesh: Mesh, min_size: int = 0) -> NamedSharding:
    """Shard the largest axis divisible by the data-axis size; else
    replicate. Leaves with fewer than `min_size` elements replicate."""
    n = mesh.shape[DATA_AXIS]
    shape = getattr(x, "shape", ())
    if int(np.prod(shape)) < min_size:
        return replicated_sharding(mesh)
    best_axis, best_size = None, 0
    for i, d in enumerate(shape):
        if d % n == 0 and d > best_size:
            best_axis, best_size = i, d
    if best_axis is None or n == 1:
        return replicated_sharding(mesh)
    spec = [None] * len(shape)
    spec[best_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def _param_sharding(path, x, mesh: Mesh, tp: bool) -> NamedSharding:
    if not tp:
        return replicated_sharding(mesh)
    return NamedSharding(mesh, tp_spec(path_names(path), x.shape, mesh))


def _opt_sharding(path, x, mesh: Mesh, zero1: bool, tp: bool,
                  zero1_min_size: int = ZERO1_MIN_SIZE):
    """Optimizer-state leaf sharding: mirror the TP spec of the parameter
    the moment tracks (path suffix after the last 'params'), else ZeRO-1
    over `data` (leaves >= zero1_min_size elements only), else replicated."""
    if tp:
        tail = opt_leaf_param_names(path)
        if tail is not None:
            spec = tp_spec(tail, x.shape, mesh)
            if spec != jax.sharding.PartitionSpec():
                return NamedSharding(mesh, spec)
    if zero1:
        return _zero1_sharding_for(x, mesh, min_size=zero1_min_size)
    return replicated_sharding(mesh)


def shard_train_state(state: TrainState, mesh: Mesh,
                      zero1: bool = False, tp: bool = False,
                      zero1_min_size: int = ZERO1_MIN_SIZE) -> TrainState:
    """Place a train state on the mesh: params replicated (or TP-sharded
    over `model`), opt_state replicated / ZeRO-1 / mirroring TP.

    One batched device_put per tree (not per leaf): per-leaf puts each pay
    a full dispatch round-trip, which is seconds-per-hundred-leaves on slow
    hosts and serializes transfers the runtime could overlap."""
    rep = replicated_sharding(mesh)
    params_s = jax.tree_util.tree_map_with_path(
        lambda p, x: _param_sharding(p, x, mesh, tp), state.params)
    opt_s = jax.tree_util.tree_map_with_path(
        lambda p, x: _opt_sharding(p, x, mesh, zero1, tp, zero1_min_size),
        state.opt_state)
    params = jax.device_put(state.params, params_s)
    opt_state = jax.device_put(state.opt_state, opt_s)
    return state.replace(step=jax.device_put(state.step, rep),
                         params=params, opt_state=opt_state)


def make_sharded_train_step(pipeline: StableMTLPipeline, mesh: Mesh,
                            base_seed: int = 0, zero1: bool = False,
                            tp: bool = False, donate: bool = True,
                            compute_grad_stats: bool = False,
                            zero1_min_size: int = ZERO1_MIN_SIZE) -> Callable:
    """Jitted step with explicit shardings over `mesh`.

    Returns fn(state, batch) like make_train_step; `state` must have been
    placed with shard_train_state(mesh, zero1=..., tp=...). Output
    shardings mirror the inputs so the layout is stable across steps.
    With tp=True the transformer projection weights (and their optimizer
    moments) are sharded over the `model` axis (tensor_parallel.py policy)
    and GSPMD inserts the collectives.
    """
    inner = make_train_step(pipeline, base_seed=base_seed, donate=False,
                            compute_grad_stats=compute_grad_stats)
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    # place the frozen trees (VAE + text table + child UNet — multi-GB
    # when loaded from converted .npz as host numpy) on device ONCE:
    # numpy jit args are re-shipped on EVERY call (CLAUDE.md hazard,
    # measured 4.07 -> 0.66 img/s of transfer noise)
    frozen = jax.device_put(inner.frozen,
                            jax.tree_util.tree_map(lambda _: rep,
                                                   inner.frozen))

    # Build sharding pytrees from a template state placed per policy.
    def state_shardings(state: TrainState):
        params_s = jax.tree_util.tree_map_with_path(
            lambda p, x: _param_sharding(p, x, mesh, tp), state.params)
        opt_s = jax.tree_util.tree_map_with_path(
            lambda p, x: _opt_sharding(p, x, mesh, zero1, tp,
                                       zero1_min_size),
            state.opt_state)
        return TrainState(step=rep, params=params_s, opt_state=opt_s,
                          tx=state.tx)

    compiled = {}

    def step(state: TrainState, batch):
        key = tuple(sorted((k, tuple(np.shape(v)))
                           for k, v in batch.items()))
        if key not in compiled:
            # sharding pytrees only matter at compile time; rebuilding
            # NamedShardings for ~1500 leaves every step is pure host
            # overhead on the hot path
            ss = state_shardings(state)
            batch_s = {k: (bsh if np.ndim(v) >= 1 else rep)
                       for k, v in batch.items()}
            frozen_s = jax.tree_util.tree_map(lambda _: rep, frozen)
            metrics_s = None  # let XLA pick (replicated scalars)
            compiled[key] = jax.jit(
                inner.jitted.__wrapped__,
                in_shardings=(ss, frozen_s, batch_s),
                out_shardings=(ss, metrics_s),
                donate_argnums=(0,) if donate else (),
            )
        with mesh:
            return compiled[key](state, frozen, batch)

    step.frozen = frozen
    return step
