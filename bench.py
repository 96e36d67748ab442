"""Headline benchmark: fused multi-task inference throughput, one chip.

Metric (BASELINE.json): "512x512 multi-task images/sec/chip" — one unit of
work = ONE input image fully processed for ALL 7 tasks through the flagship
multi-stream StableMTL model (VAE encode pair, 7 child-tap streams, 7 main
UNet streams with cross-task attention, 7 VAE decodes).

Baseline (vs_baseline denominator): the reference has no published numbers
(BASELINE.md); we use a documented engineering estimate of the PyTorch
reference on one A100: per main task it runs 6 child + 1 main SD2-UNet
forwards sequentially (stablemtl_pipeline.py:495-513,595) at 64x64 latent
(~43 ms/forward at batch 1 fp16 incl. launch overhead) + VAE encode/decode;
all 7 tasks => 49 UNet forwards + 8 VAE passes ~= 2.4 s => ~0.4 multi-task
images/sec. vs_baseline = measured / 0.4.

Env knobs: STABLEMTL_BENCH_PRESET (full|small|tiny, default full on TPU,
tiny elsewhere), STABLEMTL_BENCH_RES (default 512), STABLEMTL_BENCH_BATCH
(default 1), STABLEMTL_BENCH_ITERS (default 8).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from stablemtl_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

A100_MULTITASK_IMG_PER_S_EST = 0.4  # see module docstring


def main():
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    preset = os.environ.get("STABLEMTL_BENCH_PRESET",
                            "full" if on_tpu else "tiny")
    res = int(os.environ.get("STABLEMTL_BENCH_RES", "512" if on_tpu else "64"))
    batch = int(os.environ.get("STABLEMTL_BENCH_BATCH", "1"))
    iters = int(os.environ.get("STABLEMTL_BENCH_ITERS", "8"))
    dtype = "bfloat16" if on_tpu else "float32"

    from __graft_entry__ import _build_pipeline

    pipe = _build_pipeline(preset, multi_stream=True, image_hw=(res, res),
                           dtype=dtype)
    if dtype == "bfloat16":
        # keep normalization params f32, cast the big matmul/conv weights
        def cast(p):
            return p.astype(jnp.bfloat16) if p.ndim >= 2 else p
        pipe.unet_params = jax.tree_util.tree_map(cast, pipe.unet_params)
        pipe.unet_child_params = jax.tree_util.tree_map(
            cast, pipe.unet_child_params)
        pipe.vae_params = jax.tree_util.tree_map(cast, pipe.vae_params)

    from stablemtl_tpu.pipeline import jit_infer_all_tasks

    fn = jit_infer_all_tasks(pipe)
    rgb = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (batch, res, res, 3)),
        jnp.float32)

    out = fn(rgb, rgb)  # compile + warmup
    out.block_until_ready()
    out = fn(rgb, rgb)
    out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(rgb, rgb)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    imgs_per_s = batch * iters / dt
    print(json.dumps({
        "metric": f"multitask_images_per_sec_{res}x{res}_{preset}_{backend}",
        "value": round(imgs_per_s, 4),
        "unit": "images/sec/chip (all 7 tasks per image)",
        "vs_baseline": round(imgs_per_s / A100_MULTITASK_IMG_PER_S_EST, 3),
    }))


if __name__ == "__main__":
    main()
