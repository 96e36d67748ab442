#!/usr/bin/env python
"""Eval-protocol throughput: shared multi-task inference vs the
reference's per-task full-pipeline protocol, one chip @512x512 bf16.

A 2-task eval dataset (DIODE depth+normal, KITTI flow+scene-flow, MID
albedo+shading) costs, per batch:
  reference protocol: 2 full pipelines (2x encode, 2x child taps,
                      1 main stream + 1 decode each)
  infer_tasks([t0,t1]): encode + child taps ONCE, 2 main streams,
                      2 decodes
Timing: chained fori_loop + scalar fetch + slope (BENCH_NOTES.md
methodology). Env: STABLEMTL_BENCH_BATCH (default 4), _RES (512),
_ITERS (6)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from stablemtl_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    res = int(os.environ.get("STABLEMTL_BENCH_RES", "512" if on_tpu
                             else "32"))
    B = int(os.environ.get("STABLEMTL_BENCH_BATCH", "4" if on_tpu else "1"))
    iters = int(os.environ.get("STABLEMTL_BENCH_ITERS", "6"))
    dtype = "bfloat16" if on_tpu else "float32"

    from __graft_entry__ import _build_pipeline
    from stablemtl_tpu.pipeline import (_params_bundle, _rebind,
                                        put_params_on_device)

    preset = os.environ.get("STABLEMTL_BENCH_PRESET",
                            "full" if on_tpu else "tiny")
    pipe = _build_pipeline(preset, multi_stream=True, image_hw=(res, res),
                           dtype=dtype)
    if dtype == "bfloat16":
        from stablemtl_tpu.serving import cast_params_for_inference

        pipe = cast_params_for_inference(pipe)

    # one shared idiom for the device-residency requirement (see helper)
    pipe = put_params_on_device(pipe)

    bundle = _params_bundle(pipe)
    rgb = jnp.asarray(np.random.RandomState(0)
                      .uniform(-1, 1, (B, res, res, 3)), jnp.float32)
    tasks2 = jnp.asarray([0, 1], jnp.int32)  # depth + normal (DIODE row)

    @jax.jit
    def chain_shared(b, x, n):
        p = _rebind(pipe, b)

        def body(_, carry):
            r, acc = carry
            out = p.infer_tasks(r, r, tasks2)
            return r + out[0].astype(r.dtype) * 1e-8, acc + out.mean()

        r, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc + r.mean()

    @jax.jit
    def chain_per_task(b, x, n):
        p = _rebind(pipe, b)

        def body(_, carry):
            r, acc = carry
            # reference protocol: one full pipeline per output_type
            # (stablemtl_trainer.py:650-660)
            o0 = p.infer(r, r, jnp.asarray(0))
            o1 = p.infer(r, r, jnp.asarray(1))
            return (r + o0.astype(r.dtype) * 1e-8,
                    acc + o0.mean() + o1.mean())

        r, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc + r.mean()

    def slope(chain):
        float(chain(bundle, rgb, 1))  # compile + warm
        t0 = time.perf_counter(); float(chain(bundle, rgb, 2))
        t1 = time.perf_counter(); float(chain(bundle, rgb, 2 + iters))
        t2 = time.perf_counter()
        return max(((t2 - t1) - (t1 - t0)) / iters, 1e-9)

    per_shared = slope(chain_shared)
    per_ref = slope(chain_per_task)
    print(json.dumps({
        "metric": f"eval_2task_batch{B}_{res}x{res}",
        "shared_s_per_batch": round(per_shared, 4),
        "per_task_s_per_batch": round(per_ref, 4),
        "speedup": round(per_ref / per_shared, 3)}), flush=True)


if __name__ == "__main__":
    main()
