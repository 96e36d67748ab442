#!/usr/bin/env python
"""Component-level TPU benchmark: VAE decode / child UNet / main streams.

Prints one JSON line per component with ms/unit and achieved TFLOPS so
BENCH_NOTES.md's ablation table can be updated after kernel changes
(round-2 target: decode, 44% of round-1 inference).

Timing uses the chained-fori_loop + scalar-fetch slope methodology from
bench.py (the axon tunnel executes asynchronously; block_until_ready does
not reliably synchronize). All parameters are passed as jit ARGUMENTS —
closing over them would bake GBs of weights into the HLO as constants.

Usage: python tools/bench_breakdown.py [decode] [decode_noattn] [child]
       [full] [encode]   (default: decode decode_noattn full)
Env: STABLEMTL_BENCH_RES (512), STABLEMTL_BENCH_BATCH (4), _ITERS (8).
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


def timed_slope(fn, iters):
    """per-iteration seconds via the two-chain-length slope."""
    def run(n):
        t0 = time.perf_counter()
        float(fn(n))
        return time.perf_counter() - t0

    run(1)  # compile + warmup
    t1, t2 = run(2), run(2 + iters)
    return max((t2 - t1) / iters, 1e-9)


def make_chain(f):
    """chain(n, x0, params): n serialized applications of f(x, params)."""
    @jax.jit
    def chain(n, x0, params):
        def body(_, carry):
            x, acc = carry
            out = f(x, params)
            s = out.mean().astype(jnp.float32)
            return x + (s * 1e-12).astype(x.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
        return acc

    return chain


def main():
    parts = sys.argv[1:] or ["decode", "decode_noattn", "encode", "child",
                             "full"]
    res = int(os.environ.get("STABLEMTL_BENCH_RES", "512"))
    batch = int(os.environ.get("STABLEMTL_BENCH_BATCH", "4"))
    iters = int(os.environ.get("STABLEMTL_BENCH_ITERS", "8"))
    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        res = int(os.environ.get("STABLEMTL_BENCH_RES", "64"))
    dtype = "bfloat16" if on_tpu else "float32"

    from __graft_entry__ import _build_pipeline
    from stablemtl_tpu.pipeline import (N_TASKS, _params_bundle, _rebind,
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

    lat_hw = res // 8
    r = np.random.RandomState(0)

    def report(name, per_iter_s, units_per_iter, tflop_per_unit=None):
        ms = per_iter_s * 1000 / units_per_iter
        rec = {"component": name, "ms_per_unit": round(ms, 3),
               "units_per_iter": units_per_iter}
        if tflop_per_unit:
            rec["achieved_tflops"] = round(tflop_per_unit / (ms / 1000), 1)
        print(json.dumps(rec), flush=True)

    # decode: 7 tasks x batch images per iteration (bench.py's mix)
    n_dec = N_TASKS * batch
    lat = jnp.asarray(r.uniform(-1, 1, (n_dec, lat_hw, lat_hw, 4)),
                      jnp.float32) * 0.18215
    vae_cls = type(pipe.vae)

    if "decode" in parts:
        vae = pipe.vae
        chain = make_chain(lambda x, p: vae.apply(
            p, x.astype(jnp.float32), method=vae_cls.decode))
        per = timed_slope(lambda n: chain(n, lat, pipe.vae_params), iters)
        # SD2 VAE decoder ~2.5 TFLOP per 512x512 image (conv tally)
        report("vae_decode", per, n_dec,
               tflop_per_unit=2.5 * (res / 512) ** 2 if preset == "full"
               else None)

    if "decode_noattn" in parts:
        from stablemtl_tpu.models import vae as vae_mod

        orig = vae_mod.VAEAttention.__call__
        vae_mod.VAEAttention.__call__ = lambda self, x: x
        try:
            # only the VAE is needed; building a full second pipeline OOMs
            # next to the resident one
            vae2 = vae_mod.AutoencoderKL(pipe.vae.config)
            p2 = jax.jit(vae2.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, res, res, 3)))
            if dtype == "bfloat16":
                p2 = jax.tree_util.tree_map(
                    lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p,
                    p2)
            chain = make_chain(lambda x, p: vae2.apply(
                p, x.astype(jnp.float32), method=vae_cls.decode))
            per = timed_slope(lambda n: chain(n, lat, p2), iters)
            report("vae_decode_noattn", per, n_dec)
        finally:
            vae_mod.VAEAttention.__call__ = orig

    if "encode" in parts:
        img = jnp.asarray(r.uniform(-1, 1, (2 * batch, res, res, 3)),
                          jnp.float32)
        vae = pipe.vae
        chain = make_chain(lambda x, p: vae.apply(
            p, x, method=vae_cls.encode))
        per = timed_slope(lambda n: chain(n, img, pipe.vae_params), iters)
        report("vae_encode", per, 2 * batch)

    if "child" in parts:
        lat1 = jnp.asarray(r.uniform(-1, 1, (batch, lat_hw, lat_hw, 4)),
                           jnp.float32)
        bundle = _params_bundle(pipe)

        def child_feats(x, b):
            taps = _rebind(pipe, b).child_taps_all_tasks(x, x, None)
            return sum(t.mean() for t in taps) + x.mean()

        chain = make_chain(child_feats)
        per = timed_slope(lambda n: chain(n, lat1, bundle), iters)
        report("child_taps_all_tasks", per, N_TASKS * batch)

    if {"main", "main_notask", "kv_tables"} & set(parts):
        lat1 = jnp.asarray(r.uniform(-1, 1, (batch, lat_hw, lat_hw, 4)),
                           jnp.float32)
        bundle = _params_bundle(pipe)
        # child taps once, resident on device (they are an INPUT to the
        # main streams, not part of what we're timing here)
        taps = jax.jit(lambda x, b: _rebind(pipe, b)
                       .child_taps_all_tasks(x, x, None))(lat1, bundle)
        all_idx = jnp.arange(N_TASKS)

        def perturb(tp, x):
            # make the taps depend on the chain state or XLA hoists every
            # tap-only computation (the K/V tables) out of the fori_loop
            eps = x.mean() * 1e-12
            return [t + eps.astype(t.dtype) for t in tp]

        if "kv_tables" in parts:
            from stablemtl_tpu.models.unet import task_kv_tables

            def kv_only(x, p):
                b, tp = p
                tabs = task_kv_tables(pipe.unet.config, b["unet"],
                                      perturb(tp, x))
                return sum(t[0].mean() + t[1].mean()
                           for t in tabs if t is not None) + x.mean()

            chain = make_chain(kv_only)
            per = timed_slope(lambda n: chain(n, lat1, (bundle, taps)), iters)
            report("task_kv_tables", per, N_TASKS * batch)

        def main_fn(with_task):
            def f(x, p):
                b, tp = p
                preds = _rebind(pipe, b).main_streams(
                    x, x, perturb(tp, x) if with_task else tp, all_idx,
                    with_task_attention=with_task)
                return preds.mean()
            return f

        if "main" in parts:
            chain = make_chain(main_fn(True))
            per = timed_slope(lambda n: chain(n, lat1, (bundle, taps)), iters)
            report("main_streams", per, N_TASKS * batch)

        if "main_notask" in parts:
            chain = make_chain(main_fn(False))
            per = timed_slope(lambda n: chain(n, lat1, (bundle, taps)), iters)
            report("main_streams_no_task_attn", per, N_TASKS * batch)

    if "full" in parts:
        rgb = jnp.asarray(r.uniform(-1, 1, (batch, res, res, 3)),
                          jnp.float32)
        bundle = _params_bundle(pipe)

        @jax.jit
        def chain(n, rgb, b):
            p = _rebind(pipe, b)

            def body(_, carry):
                x, acc = carry
                out = p.infer_all_tasks(x, x)
                return x + out[0].astype(x.dtype) * 1e-8, acc + out.mean()

            _, acc = jax.lax.fori_loop(0, n, body, (rgb, jnp.float32(0)))
            return acc

        per = timed_slope(lambda n: chain(n, rgb, bundle), iters)
        report("full_multitask_infer", per, batch)
        print(json.dumps({
            "metric": f"multitask_images_per_sec_{res}x{res}",
            "value": round(batch / per, 4)}), flush=True)


if __name__ == "__main__":
    main()
