#!/usr/bin/env python
"""A/B the flash-kernel softmax variants on chip at the production shapes.

Sweeps STABLEMTL_FLASH_FAST_SOFTMAX (no running max) and
STABLEMTL_FLASH_MXU_LSUM (normalizer rides the P@V matmul) — alone and
combined — against the exact kernel, forward-only and fwd+bwd, at the
fused-step self-attention shapes (28 streams = 7 tasks x batch 4; S=4096
H=5 and S=1024 H=10, D=64, bf16). The flags are trace-time: each combo
re-jits a fresh chain (the env is mutated between traces, never between
calls of one executable).

Timing: chained-fori_loop + scalar-fetch slope (see bench.py; the axon
tunnel executes asynchronously and block_until_ready is not reliable).

Usage: python tools/bench_flash_variants.py   (on the TPU, ~10-20 min)
"""

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

COMBOS = (
    ("exact", {}),
    ("fast_softmax", {"STABLEMTL_FLASH_FAST_SOFTMAX": "1"}),
    ("mxu_lsum", {"STABLEMTL_FLASH_MXU_LSUM": "1"}),
    ("fast+lsum", {"STABLEMTL_FLASH_FAST_SOFTMAX": "1",
                   "STABLEMTL_FLASH_MXU_LSUM": "1"}),
    ("poly3", {"STABLEMTL_FLASH_POLY_EXP": "3"}),
    ("fast+poly3", {"STABLEMTL_FLASH_FAST_SOFTMAX": "1",
                    "STABLEMTL_FLASH_POLY_EXP": "3"}),
    ("fast+poly4", {"STABLEMTL_FLASH_FAST_SOFTMAX": "1",
                    "STABLEMTL_FLASH_POLY_EXP": "4"}),
)

FLAG_KEYS = ("STABLEMTL_FLASH_FAST_SOFTMAX", "STABLEMTL_FLASH_MXU_LSUM",
             "STABLEMTL_FLASH_POLY_EXP")


def timed_slope(fn, iters=16):
    def run(n):
        t0 = time.perf_counter()
        float(fn(n))
        return time.perf_counter() - t0

    run(1)
    t1, t2 = run(2), run(2 + iters)
    return max((t2 - t1) / iters, 1e-9)


def main():
    from stablemtl_tpu.ops.flash_attention import _flash

    B = int(os.environ.get("STABLEMTL_BENCH_BATCH", "4")) * 7
    shapes = [(4096, 5), (1024, 10)]
    with_bwd = os.environ.get("STABLEMTL_BENCH_BWD", "1") == "1"
    r = np.random.RandomState(0)
    for S, H in shapes:
        qkv = [jnp.asarray(r.standard_normal((B, S, H, 64)), jnp.bfloat16)
               for _ in range(3)]
        row = {"seq": S, "heads": H, "streams": B}
        for name, env in COMBOS:
            for key in FLAG_KEYS:
                os.environ.pop(key, None)
            os.environ.update(env)

            @jax.jit
            def chain_fwd(n, q, k, v):
                def body(_, carry):
                    x, acc = carry
                    s = _flash(x, k, v).mean().astype(jnp.float32)
                    return x + (s * 1e-6).astype(x.dtype), acc + s

                _, acc = jax.lax.fori_loop(0, n, body, (q, jnp.float32(0)))
                return acc

            per = timed_slope(lambda n: chain_fwd(n, *qkv))
            row[f"{name}_fwd_ms"] = round(per * 1000, 3)

            if with_bwd:
                @jax.jit
                def chain_bwd(n, q, k, v):
                    def loss(x):
                        return _flash(x, k, v).astype(jnp.float32).mean()

                    def body(_, carry):
                        x, acc = carry
                        g = jax.grad(loss)(x)
                        s = g.astype(jnp.float32).mean()
                        return x + (s * 1e-6).astype(x.dtype), acc + s

                    _, acc = jax.lax.fori_loop(0, n, body,
                                               (q, jnp.float32(0)))
                    return acc

                per = timed_slope(lambda n: chain_bwd(n, *qkv))
                row[f"{name}_fwdbwd_ms"] = round(per * 1000, 3)
        print(json.dumps(row), flush=True)


def sweep_blocks():
    """Block-size sweep (STABLEMTL_FLASH_BLOCK_Q/_BLOCK_K) for the resident
    kernel at the S=4096 H=5 production shape, fast_softmax on (the
    fast_math default). Auto pick is 512/512 (MAX_BLOCK)."""
    from stablemtl_tpu.ops.flash_attention import _flash

    B = int(os.environ.get("STABLEMTL_BENCH_BATCH", "4")) * 7
    S, H = 4096, 5
    os.environ["STABLEMTL_FLASH_FAST_SOFTMAX"] = "1"
    r = np.random.RandomState(0)
    qkv = [jnp.asarray(r.standard_normal((B, S, H, 64)), jnp.bfloat16)
           for _ in range(3)]
    for bq in (256, 512, 1024, 2048):
        for bk in (256, 512, 1024, 2048, 4096):
            os.environ["STABLEMTL_FLASH_BLOCK_Q"] = str(bq)
            os.environ["STABLEMTL_FLASH_BLOCK_K"] = str(bk)

            @jax.jit
            def chain_fwd(n, q, k, v):
                def body(_, carry):
                    x, acc = carry
                    s = _flash(x, k, v).mean().astype(jnp.float32)
                    return x + (s * 1e-6).astype(x.dtype), acc + s

                _, acc = jax.lax.fori_loop(0, n, body, (q, jnp.float32(0)))
                return acc

            try:
                per = timed_slope(lambda n: chain_fwd(n, *qkv))
                print(json.dumps({"block_q": bq, "block_k": bk,
                                  "fwd_ms": round(per * 1000, 3)}),
                      flush=True)
            except Exception as e:  # VMEM overflow at the big combos
                print(json.dumps({"block_q": bq, "block_k": bk,
                                  "error": type(e).__name__}), flush=True)


if __name__ == "__main__":
    if "sweep" in sys.argv[1:]:
        sweep_blocks()
    else:
        main()
