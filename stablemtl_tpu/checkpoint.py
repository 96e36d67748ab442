"""Checkpoint save/restore (orbax) with the reference's resume contract.

Reference behavior (stablemtl_trainer.py:1111-1205, SURVEY.md §5):
- periodic `latest` checkpoint + immutable `iter_XXXXXX` backups
- trainer state dict {effective_iter, epoch, n_batch_in_epoch, best_metric,
  in_evaluation, seed info} saved alongside the weights
- atomic-ish replacement of `latest` (orbax writes to a tmp dir + renames,
  strictly better than the reference's `_old_` rename dance)
- VAE/text-encoder are never saved (frozen, restored from the base weights).

The TPU contract improves on the reference: the data-loader position and all
per-step randomness derive from the step counter (fold_in), so `step` is the
only iterator state to persist — no seed lists (SURVEY.md §7).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_state import TrainState

LATEST = "latest"

_SYNC_COUNT = [0]


def _sync_processes(tag: str) -> None:
    """Cross-process barrier (no-op single-process). Each call site tags a
    unique barrier name — orbax requires distinct names per rendezvous."""
    if jax.process_count() <= 1:
        return
    _SYNC_COUNT[0] += 1
    from orbax.checkpoint import multihost as ocp_multihost

    ocp_multihost.sync_global_processes(f"{tag}_{_SYNC_COUNT[0]}")


class CheckpointManager:
    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- save ------------------------------------------------------------

    def save(self, state: TrainState, meta: Optional[dict] = None,
             name: str = LATEST, overwrite: bool = True):
        """Save trainable params + optimizer state + step, plus JSON meta.

        Multi-process safe: the orbax save itself is collective (every
        process writes its addressable shards to the shared directory);
        the overwrite swap-dance renames and the meta write run on process
        0 only, with a barrier so no process proceeds past a half-swapped
        `latest` (reference analogue: accelerate's main-process-gated
        save, train_stablemtl.py:206-209)."""
        path = os.path.join(self.ckpt_dir, name)
        payload = {"step": state.step, "params": state.params,
                   "opt_state": state.opt_state}
        if overwrite and os.path.exists(path):
            # orbax refuses to overwrite; write to tmp then swap
            tmp = path + ".tmp_swap"
            self._ckptr.save(tmp, payload)
            self._ckptr.wait_until_finished()
            if jax.process_index() == 0:
                old = path + ".old"
                os.rename(path, old)
                os.rename(tmp, path)
                import shutil
                shutil.rmtree(old, ignore_errors=True)
            _sync_processes("stablemtl_ckpt_swap")
        else:
            self._ckptr.save(path, payload)
            self._ckptr.wait_until_finished()
        if meta is not None and jax.process_index() == 0:
            with open(os.path.join(self.ckpt_dir, f"{name}.meta.json"),
                      "w") as f:
                json.dump(_jsonable(meta), f, indent=2)
        _sync_processes("stablemtl_ckpt_done")
        return path

    def save_backup(self, state: TrainState, meta: Optional[dict] = None,
                    step: Optional[int] = None):
        """Immutable iter_XXXXXX backup (trainer save_period/backup_period).

        `step` names the directory (the trainer passes the EFFECTIVE iter,
        matching the reference's iter_XXXXXX contract); defaults to the
        state's micro-step counter."""
        s = int(state.step) if step is None else int(step)
        return self.save(state, meta, name=f"iter_{s:06d}",
                         overwrite=False)

    # -- restore ---------------------------------------------------------

    def exists(self, name: str = LATEST) -> bool:
        return os.path.isdir(os.path.join(self.ckpt_dir, name))

    def restore(self, state: TrainState, name: str = LATEST) -> TrainState:
        """Restore into the (abstract or concrete) structure of `state`."""
        path = os.path.join(self.ckpt_dir, name)
        target = {"step": state.step, "params": state.params,
                  "opt_state": state.opt_state}
        restored = self._ckptr.restore(path, target)
        return state.replace(step=restored["step"],
                             params=restored["params"],
                             opt_state=restored["opt_state"])

    def restore_params_only(self, state: TrainState,
                            name: str = LATEST) -> TrainState:
        """Restore step + params, ignoring the optimizer state.

        Eval must not reconstruct the training optimizer tree: a run trained
        with gradient accumulation has a MultiStepsState opt_state whose
        structure depends on accumulation_steps, and rebuilding it wrong
        makes a full `restore` fail on tree mismatch (reference eval loads
        only the UNet weights, eval_mtl.py:317-344 /
        stablemtl_trainer.py:1176-1181).
        """
        step, params = restore_params(self.ckpt_dir, state.params, name)
        return state.replace(step=np.asarray(step).astype(np.int32),
                             params=params)

    def load_meta(self, name: str = LATEST) -> dict:
        p = os.path.join(self.ckpt_dir, f"{name}.meta.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)


def restore_params(ckpt_dir: str, params_template, name: str = LATEST):
    """Structure-free restore of (step, params) straight into a params
    pytree — for inference entry points (serve CLI, Predictor setups) that
    never build a TrainState. Dtypes follow the template leaves (read from
    .dtype metadata only — np.asarray on a device-resident template leaf
    would fetch GBs through the low-bandwidth tunnel)."""
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(os.path.join(os.path.abspath(ckpt_dir), name))
    params = jax.tree_util.tree_map(
        lambda tgt, new: np.asarray(new).astype(tgt.dtype)
        if hasattr(tgt, "dtype") else new,
        params_template, raw["params"])
    return int(np.asarray(raw["step"])), params


def _jsonable(obj: Any):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.ndarray, jax.Array)):
        return np.asarray(obj).tolist()
    return obj
