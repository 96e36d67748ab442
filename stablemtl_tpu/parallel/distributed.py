"""Multi-host (multi-process) distribution.

The reference trains multi-GPU/multi-node through HF Accelerate's DDP
(NCCL process group, /root/reference/train_stablemtl.py:176-184;
config/accelerator/multigpus_8.yaml). The TPU-native equivalent
(SURVEY.md §5 comm row) is JAX multi-controller:

- `jax.distributed.initialize()` once per host process, BEFORE any other
  jax call: on a TPU pod slice with no explicit configuration it
  auto-discovers the coordinator from the TPU metadata; elsewhere the
  coordinator/process env vars configure it explicitly.
- One GLOBAL mesh over `jax.devices()` (all chips of all hosts);
  GSPMD lays gradient all-reduces over ICI within a slice and DCN across
  slices — identical step code on 1 host and N.
- Each process feeds only its addressable shard of the global batch
  (`jax.make_array_from_process_local_data`); the deterministic
  MixedTaskSchedule is seed+step pure, so every process computes the SAME
  schedule and takes a distinct contiguous slice of each batch — the
  one-task-per-effective-batch invariant holds globally by construction
  (the reference instead re-seeds per rank, train_stablemtl.py:247-249,
  which cannot keep ranks on the same task).
- Host-side artifacts (TensorBoard, vis PNGs, config/code snapshots,
  eval CSVs) are process-0-only; orbax checkpoint save/restore is
  collective and runs on ALL processes (each writes its addressable
  shards).

Env contract (all optional; nothing set = single-process, no init):
  STABLEMTL_DIST=1                 auto-init (TPU pod metadata discovery)
  STABLEMTL_COORDINATOR=host:port  explicit coordinator address
  STABLEMTL_NUM_PROCESSES=N        explicit process count
  STABLEMTL_PROCESS_ID=i           explicit process id
  STABLEMTL_LOCAL_DEVICE_IDS=0,1   optional device restriction (tests)
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)

_INITIALIZED = False


def maybe_initialize() -> bool:
    """Env-gated `jax.distributed.initialize()`; call FIRST (before any
    other jax API creates the backend client). Returns True if the
    distributed runtime was (already) initialized by us.

    Idempotent: safe to call from both the CLI and library entry points.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coord = os.environ.get("STABLEMTL_COORDINATOR")
    nproc = os.environ.get("STABLEMTL_NUM_PROCESSES")
    auto = os.environ.get("STABLEMTL_DIST", "").strip() in ("1", "auto")
    if not (coord or nproc or auto):
        return False

    import jax

    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
    if nproc:
        kwargs["num_processes"] = int(nproc)
        pid = os.environ.get("STABLEMTL_PROCESS_ID")
        if pid is None:
            raise ValueError(
                "STABLEMTL_NUM_PROCESSES is set but STABLEMTL_PROCESS_ID "
                "is not; each process must know its id")
        kwargs["process_id"] = int(pid)
    ids = os.environ.get("STABLEMTL_LOCAL_DEVICE_IDS")
    if ids:
        kwargs["local_device_ids"] = [int(x) for x in ids.split(",")]
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    log.info("jax.distributed initialized: process %d/%d, %d/%d devices "
             "local", jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return process_index() == 0


def loader_shard() -> Optional[tuple]:
    """(process_index, process_count) for the data loader, or None when
    single-process (keeps the loader's single-host path untouched)."""
    n = process_count()
    return (process_index(), n) if n > 1 else None
