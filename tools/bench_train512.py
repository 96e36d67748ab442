#!/usr/bin/env python
"""512x512 TRAINING-step benchmark with the Pallas flash kernel on/off.

VERDICT round-1 item 8: the flash fwd+bwd kernels were only measured in a
microbenchmark; this times the full jitted multi-stream training step at
512x512 (self-attention seq 4096 inside fwd+bwd) with the kernel enabled
vs the XLA fallback (STABLEMTL_DISABLE_FLASH), single chip.

Single-chip 512x512 training needs adafactor + remat + bf16 (HBM notes in
CLAUDE.md / BENCH_NOTES.md). Timing: train steps serialize through the
state dependency; fetch the final loss scalar and take the slope between
two run lengths.

Env: STABLEMTL_BENCH_BATCH (default 1), STABLEMTL_BENCH_ITERS (default 4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # keep the env platform primary but register cpu too: the axon backend
    # exposes no HLO cost model, so the MFU block lowers the step for the
    # in-process cpu backend (see bench.py, same pattern)
    _plats = os.environ["JAX_PLATFORMS"]
    if "cpu" not in _plats.split(","):
        _plats += ",cpu"
    os.environ["JAX_PLATFORMS"] = _plats
    jax.config.update("jax_platforms", _plats)

from stablemtl_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np


def build(res: int, dtype: str):
    from stablemtl_tpu.factory import model_configs
    from stablemtl_tpu.models import AutoencoderKL, UNet2DConditionModel
    from stablemtl_tpu.pipeline import N_TASKS, StableMTLPipeline

    on_tpu = jax.default_backend() not in ("cpu",)
    # fast_math during TRAINING (bf16 norm outputs + tanh gelu in fwd+bwd)
    # is an opt-in measured variant, not the default: the reference itself
    # trains mixed-precision fp16 (config/accelerator/multigpus_8.yaml), so
    # bf16-norm training is within its numeric envelope, but exact math
    # stays the default here as everywhere outside bench inference.
    fm = os.environ.get("STABLEMTL_FAST_MATH") == "1"
    ucfg, ccfg, vcfg, text_dim = model_configs(
        "full" if on_tpu else "tiny", True, {"attn_mask_ratio": 0.4},
        dtype=dtype, remat=True, fast_math=fm,
        remat_transformer=os.environ.get("STABLEMTL_BENCH_REMAT_TF", "none"))

    lh = lw = res // 8
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    vae = AutoencoderKL(vcfg)
    vae_params = jax.jit(vae.init)(k[0], jnp.zeros((1, res, res, 3)))
    text = jnp.zeros((1, 5, text_dim))
    child = UNet2DConditionModel(ccfg)
    child_params = jax.jit(
        lambda r, x, t, c: child.init(r, x, t, c,
                                      tap="afterSelfAttn_residual")
    )(k[1], jnp.zeros((1, lh, lw, 12)), jnp.zeros((1,), jnp.int32), text)
    _, taps = child.apply(child_params, jnp.zeros((1, lh, lw, 12)),
                          jnp.zeros((1,), jnp.int32), text,
                          tap="afterSelfAttn_residual")
    feats = [jnp.zeros((N_TASKS - 1,) + t.shape) for t in taps]
    unet = UNet2DConditionModel(ucfg)
    unet_params = jax.jit(
        lambda r, x, t, c: unet.init(r, x, t, c, task_feats=feats,
                                     main_idx=jnp.asarray(0),
                                     aux_idx=jnp.arange(1, N_TASKS))
    )(k[2], jnp.zeros((1, lh, lw, 12)), jnp.zeros((1,), jnp.int32), text)

    if dtype == "bfloat16":
        def cast(p):
            return p.astype(jnp.bfloat16) if p.ndim >= 2 else p
        vae_params = jax.tree_util.tree_map(cast, vae_params)
        child_params = jax.tree_util.tree_map(cast, child_params)

    table = jax.random.normal(k[3], (N_TASKS, 5, text_dim)) * 0.02
    return StableMTLPipeline(
        vae=vae, unet=unet, vae_params=vae_params, unet_params=unet_params,
        text_embed_table=table, unet_child=child,
        unet_child_params=child_params)


def time_variant(pipe, batch, iters):
    """HBM-lean timing: the step takes main params from the STATE (frozen
    child/vae are separate), so the original pipe.unet_params reference is
    dropped and the state donated — ~2 params-sized buffers fewer than a
    donate=False loop, which OOMs the 512x512 step on a 15.75G chip. The
    chain continues across timed segments (donation invalidates old
    states); slope between segment lengths cancels fixed costs."""
    from stablemtl_tpu.train_state import (OptimizerConfig,
                                           create_train_state,
                                           make_train_step)

    state = create_train_state(
        pipe.unet_params,
        OptimizerConfig(optimizer="adafactor", use_schedule=False))
    pipe.unet_params = None
    step = make_train_step(pipe, donate=True)

    # host-numpy args re-ship through the low-bandwidth tunnel on EVERY
    # call (CLAUDE.md hazard; ~10 MB/step at 512x512) — put them once.
    batch = jax.device_put(batch)

    s_loss = [state, 0.0]

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            s_loss[0], metrics = step(s_loss[0], batch)
        s_loss[1] = float(metrics["loss"])
        return time.perf_counter() - t0

    run(1)  # compile + warmup
    t1, t2 = run(1), run(1 + iters)
    per = max((t2 - t1) / iters, 1e-9)
    return per, s_loss[1]


def _train_step_flops(pipe, batch) -> float:
    """Pre-optimization FLOPs of ONE train step from the HLO cost model.

    The axon backend exposes no cost model, so the step is lowered for the
    in-process CPU backend (flop count is backend-independent); Pallas
    flash must be off for that trace (same math, same count — bench.py
    uses the identical fallback). Abstract lowering only: no state or
    optimizer memory is allocated."""
    try:
        from stablemtl_tpu.train_state import (OptimizerConfig,
                                               create_train_state,
                                               make_train_step)

        state_shapes = jax.eval_shape(
            lambda p: create_train_state(
                p, OptimizerConfig(optimizer="adafactor",
                                   use_schedule=False)),
            pipe.unet_params)
        batch_shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x),
                                           np.asarray(x).dtype), batch)
        prev = os.environ.get("STABLEMTL_DISABLE_FLASH")
        os.environ["STABLEMTL_DISABLE_FLASH"] = "1"
        try:
            step = make_train_step(pipe, donate=False)
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                lowered = step.jitted.lower(state_shapes, step.frozen,
                                            batch_shapes)
        finally:
            if prev is None:
                del os.environ["STABLEMTL_DISABLE_FLASH"]
            else:
                os.environ["STABLEMTL_DISABLE_FLASH"] = prev
        ca = lowered.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float((ca or {}).get("flops", 0.0))
    except Exception as e:
        print(f"# train-step cost model unavailable: {e}", file=sys.stderr)
        return 0.0


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    res = int(os.environ.get("STABLEMTL_BENCH_RES", "512" if on_tpu
                             else "32"))
    B = int(os.environ.get("STABLEMTL_BENCH_BATCH", "1"))
    iters = int(os.environ.get("STABLEMTL_BENCH_ITERS", "4"))
    dtype = "bfloat16" if on_tpu else "float32"

    r = np.random.RandomState(0)
    rgb = r.uniform(-1, 1, (B, res, res, 3)).astype(np.float32)
    batch = {"rgb_norm": rgb, "rgb_next_norm": rgb,
             "target_3ch": r.uniform(-1, 1, (B, res, res, 3))
             .astype(np.float32),
             "valid_mask": np.ones((B, res, res, 1), bool),
             "task_idx": np.asarray(3, np.int32)}

    only = os.environ.get("STABLEMTL_BENCH_VARIANT")
    if only:
        # single-variant mode (one process = one clean HBM arena)
        os.environ["STABLEMTL_DISABLE_FLASH"] = \
            "" if only == "flash" else "1"
        pipe = build(res, dtype)
        flops = _train_step_flops(pipe, batch)  # before params are dropped
        per, loss = time_variant(pipe, batch, iters)
        fm_tag = "_fm" if os.environ.get("STABLEMTL_FAST_MATH") == "1" \
            else ""
        rt = os.environ.get("STABLEMTL_BENCH_REMAT_TF", "none")
        if rt != "none":
            fm_tag += f"_remat-{rt}"
        rec = {
            "variant": f"train_step_{res}x{res}_b{B}_{only}{fm_tag}",
            "s_per_step": round(per, 4),
            "train_imgs_per_sec": round(B / per, 3),
            "loss": round(loss, 5)}
        if flops > 0:
            rec["achieved_tflops"] = round(flops / per / 1e12, 1)
            if on_tpu:
                rec["mfu_vs_v5e_bf16_peak"] = round(
                    flops / per / 1e12 / 197.0, 3)
        print(json.dumps(rec), flush=True)
        return

    # run each variant in its own process: donated/freed buffers from the
    # first variant otherwise fragment the arena for the second
    import subprocess

    def run_child(extra_env):
        env = dict(os.environ, **extra_env)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True)
        sys.stderr.write(r.stderr[-2000:])
        out = None
        for line in r.stdout.splitlines():
            print(line, flush=True)
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "s_per_step" in rec:
                out = rec["s_per_step"]
        return out

    if "remat" in sys.argv[1:]:
        # transformer-remat policy A/B (VERDICT r4 #3): flash on, vary
        # STABLEMTL_BENCH_REMAT_TF. Each variant is a fresh process/arena.
        for rt in ("none", "dots", "full"):
            run_child({"STABLEMTL_BENCH_VARIANT": "flash",
                       "STABLEMTL_BENCH_REMAT_TF": rt})
        return

    if "remat_inproc" in sys.argv[1:]:
        # same A/B in ONE process (one tunnel claim — today's remote takes
        # ~15-25 min to hand the claim to each new process): only valid at
        # geometries with HBM headroom (e.g. STABLEMTL_BENCH_RES=384 b2);
        # at the 512 b1 limit donation fragmentation needs fresh arenas.
        import gc

        for rt in ("none", "dots", "full"):
            os.environ["STABLEMTL_BENCH_REMAT_TF"] = rt
            os.environ.pop("STABLEMTL_DISABLE_FLASH", None)
            pipe = build(res, dtype)
            flops = _train_step_flops(pipe, batch)
            per, loss = time_variant(pipe, batch, iters)
            rec = {"variant": f"train_step_{res}x{res}_b{B}_flash_remat-{rt}",
                   "s_per_step": round(per, 4),
                   "train_imgs_per_sec": round(B / per, 3),
                   "loss": round(loss, 5)}
            if flops > 0:
                rec["achieved_tflops"] = round(flops / per / 1e12, 1)
                if on_tpu:
                    rec["mfu_vs_v5e_bf16_peak"] = round(
                        flops / per / 1e12 / 197.0, 3)
            print(json.dumps(rec), flush=True)
            del pipe
            gc.collect()
        return

    out = {}
    for name in ("flash", "xla"):
        out[name] = run_child({"STABLEMTL_BENCH_VARIANT": name})
    if out.get("flash") and out.get("xla"):
        print(json.dumps({"flash_speedup_vs_xla":
                          round(out["xla"] / out["flash"], 3)}), flush=True)


if __name__ == "__main__":
    main()
