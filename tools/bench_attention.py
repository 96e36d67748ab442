#!/usr/bin/env python
"""Self-attention path microbench: Pallas flash vs XLA fused attention at
the real per-stage shapes of the 512x512 fused all-task step (28 streams =
7 tasks x batch 4; SD2 stage (seq, heads): (4096,5), (1024,10), (256,20)).

Sets the FLASH_MIN_SEQ boundary (ops/attention.py) empirically: flash wins
where HBM traffic for the [B,H,S,S] probs tensor dominates; XLA wins where
kernel launch + pipeline overheads do.

Timing: chained-fori_loop + scalar-fetch slope (see bench.py — the axon
tunnel executes asynchronously, block_until_ready is not a reliable sync).

Usage: python tools/bench_attention.py  (on the TPU; ~3 min)
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

from stablemtl_tpu.ops.attention import dot_product_attention


def timed_slope(fn, iters=16):
    def run(n):
        t0 = time.perf_counter()
        float(fn(n))
        return time.perf_counter() - t0

    run(1)
    t1, t2 = run(2), run(2 + iters)
    return max((t2 - t1) / iters, 1e-9)


def main():
    B = int(os.environ.get("STABLEMTL_BENCH_BATCH", "4")) * 7
    shapes = [(4096, 5), (1024, 10), (256, 20)]
    r = np.random.RandomState(0)
    for S, H in shapes:
        qkv = [jnp.asarray(r.standard_normal((B, S, H, 64)), jnp.bfloat16)
               for _ in range(3)]
        row = {"seq": S, "heads": H, "streams": B}
        for name, flag in (("flash", True), ("xla", False)):
            if flag and S < 512:
                row[f"{name}_ms"] = None  # kernel block size floor
                continue

            @jax.jit
            def chain(n, q, k, v, use_flash=flag):
                def body(_, carry):
                    x, acc = carry
                    o = dot_product_attention(x, k, v, use_flash=use_flash)
                    s = o.mean().astype(jnp.float32)
                    return x + (s * 1e-6).astype(x.dtype), acc + s

                _, acc = jax.lax.fori_loop(0, n, body,
                                           (q, jnp.float32(0)))
                return acc

            try:
                per = timed_slope(lambda n: chain(n, *qkv))
                row[f"{name}_ms"] = round(per * 1000, 3)
            except Exception as e:
                row[f"{name}_ms"] = f"error: {type(e).__name__}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
