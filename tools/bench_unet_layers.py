#!/usr/bin/env python
"""Per-module UNet timing at production shapes: WHERE do the stream ms go?

The component breakdown (tools/bench_breakdown.py) shows the child+main
UNet streams sustain ~60-75 TFLOPS while the VAE decode hits ~94% of v5e
peak. This tool times each UNet sub-module in isolation at the exact
production shapes of the 512x512 batch-4 all-task step (effective batch
28 = 7 tasks x 4 images) and prints achieved TFLOPS per module, so the
efficiency gap can be attributed to a specific layer kind instead of
guessed at.

Methodology: chained-fori_loop slope + scalar fetch (see bench.py; the
axon tunnel is async and block_until_ready does not synchronize).
Inputs are GENERATED ON DEVICE inside a jitted setup (a [28,64,64,320]
f32 host upload would crawl through the low-bandwidth tunnel); params are
initialized host-side at spatially tiny shapes (param shapes only depend
on channels) and device_put once.

Usage: python tools/bench_unet_layers.py [resnet t2d attn ff taskattn kv]
Env: STABLEMTL_BENCH_BATCH (4 -> effective 28), _ITERS (8),
     STABLEMTL_FAST_MATH (1).
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

N_TASKS = 7
L_TEXT = 4
D_TEXT = 1024
TEMB = 1280

# (latent hw at 512x512, channels, attention heads) per UNet stage
STAGES = ((64, 320, 5), (32, 640, 10), (16, 1280, 20), (8, 1280, 20))


def timed_slope(fn, iters):
    def run(n):
        t0 = time.perf_counter()
        float(fn(n))
        return time.perf_counter() - t0

    run(1)
    t1, t2 = run(2), run(2 + iters)
    return max((t2 - t1) / iters, 1e-9)


GRAD = False  # "grad" argv: time fwd+bwd per module (VERDICT r4 #3 —
# the training step's attribution; run with STABLEMTL_BENCH_BATCH=1 for
# the 512x512 batch-1 training geometry)


def make_chain(f):
    if GRAD:
        @jax.jit
        def chain(n, x0, params):
            def loss(x, p):
                out = f(x, p)
                out = out[0] if isinstance(out, tuple) else out
                return out.astype(jnp.float32).mean()

            def body(_, carry):
                x, acc = carry
                l, (gx, gp) = jax.value_and_grad(loss, argnums=(0, 1))(
                    x, params)
                # touch the param grads so the weight-gradient half of the
                # backward can't be dead-code-eliminated
                gsum = jax.tree_util.tree_reduce(
                    lambda a, b: a + b.astype(jnp.float32).sum(), gp,
                    jnp.float32(0))
                s = l + gsum * 1e-20
                return x + (s * 1e-12).astype(x.dtype), acc + s

            _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
            return acc

        return chain

    @jax.jit
    def chain(n, x0, params):
        def body(_, carry):
            x, acc = carry
            out = f(x, params)
            out = out[0] if isinstance(out, tuple) else out
            s = out.mean().astype(jnp.float32)
            return x + (s * 1e-12).astype(x.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
        return acc

    return chain


def main():
    global GRAD
    parts = sys.argv[1:] or ["resnet", "t2d", "attn", "ff", "taskattn", "kv"]
    if "grad" in parts:
        GRAD = True
        parts = [p for p in parts if p != "grad"] or [
            "resnet", "t2d", "attn", "ff", "taskattn", "kv"]
    batch = int(os.environ.get("STABLEMTL_BENCH_BATCH", "4"))
    iters = int(os.environ.get("STABLEMTL_BENCH_ITERS", "8"))
    fast = bool(int(os.environ.get("STABLEMTL_FAST_MATH", "1")))
    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B = N_TASKS * batch  # effective batch through the stream vmap
    stages = STAGES if on_tpu else ((8, 32, 2), (4, 64, 2))

    from stablemtl_tpu.models.layers import FeedForward, ResnetBlock
    from stablemtl_tpu.models.transformer import (Attention,
                                                  TaskAttentionBank,
                                                  Transformer2D, _kv_project)

    def report(name, per_iter_s, tflop):
        if GRAD:
            # fwd+bwd nominal cost = 3x the forward (activation + weight
            # gradient passes each re-run the matmul volume)
            name += "_fwdbwd"
            tflop *= 3.0
        ms = per_iter_s * 1000
        rec = {"component": name, "ms_per_iter": round(ms, 3),
               "achieved_tflops": round(tflop / per_iter_s, 1),
               "tflop_per_iter": round(tflop, 4)}
        print(json.dumps(rec), flush=True)

    def dev_input(shape, key=0):
        return jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(key), shape, dtype))()

    def time_module(name, mod, x_shape, flops, extra=None, method=None):
        """extra: fn(x) -> tuple of extra-args built inside the jit."""
        # init at spatially tiny shape: param shapes depend on channels only
        tiny = (1,) + tuple(2 if d > 8 and i < len(x_shape) - 2 else d
                            for i, d in enumerate(x_shape[1:]))
        ex_tiny = extra(jnp.zeros(tiny, dtype)) if extra else ()
        params = mod.init(jax.random.PRNGKey(0), jnp.zeros(tiny, dtype),
                          *ex_tiny)
        params = jax.device_put(params)
        x0 = dev_input(x_shape)

        def f(x, p):
            ex = extra(x) if extra else ()
            out = mod.apply(p, x, *ex)
            return out[0] if isinstance(out, tuple) else out  # (x, tap)

        chain = make_chain(f)
        per = timed_slope(lambda n: chain(n, x0, params), iters)
        report(name, per, flops / 1e12)

    for si, (hw, C, heads) in enumerate(stages):
        N = hw * hw
        NC2 = B * N * C * C

        if "resnet" in parts:
            mod = ResnetBlock(out_channels=C, dtype=dtype,
                              norm_dtype=dtype if fast else None)
            time_module(
                f"resnet_s{si}_{hw}x{hw}_c{C}", mod, (B, hw, hw, C),
                36.0 * NC2,
                extra=lambda x: (jnp.zeros((x.shape[0], TEMB), dtype),))

        if "t2d" in parts:
            mod = Transformer2D(heads=heads, dim_head=C // heads,
                                dtype=dtype, fast_math=fast)
            # qkv+out 8NC^2, self-attn 4N^2C, xattn q/out 4NC^2 (+small kv),
            # GEGLU FF 24NC^2, proj_in/out 4NC^2
            flops = 40.0 * NC2 + 4.0 * B * N * N * C
            time_module(
                f"t2d_s{si}_{hw}x{hw}_c{C}", mod, (B, hw, hw, C), flops,
                extra=lambda x: (jnp.zeros((x.shape[0], L_TEXT, D_TEXT),
                                           dtype),))

        if "attn" in parts:
            mod = Attention(heads=heads, dim_head=C // heads, out_dim=C,
                            dtype=dtype)
            time_module(f"selfattn_s{si}_n{N}_c{C}", mod, (B, N, C),
                        8.0 * NC2 + 4.0 * B * N * N * C)

        if "ff" in parts:
            mod = FeedForward(dim=C, dtype=dtype, fast_gelu=fast)
            time_module(f"ff_s{si}_n{N}_c{C}", mod, (B, N, C), 24.0 * NC2)

    # ---- task-attention machinery at production sharing layout ----------
    # hidden per stream [batch, N, C]; kv tables SHARED unbatched
    # [n_tasks, batch, N, C]; vmap over the 7 main streams.
    for si, (hw, C, heads) in enumerate(stages):
        N = hw * hw

        if "taskattn" in parts:
            bank = TaskAttentionBank(dim=C, n_tasks=N_TASKS, dtype=dtype,
                                     fast_math=fast)
            hid_t = jnp.zeros((1, 1, C), dtype)
            kv_t = (jnp.zeros((N_TASKS, 1, 1, C), dtype),) * 2
            params = jax.device_put(bank.init(
                jax.random.PRNGKey(0), hid_t, None, jnp.asarray(0),
                None, task_kv=kv_t,
                task_key_bias=jnp.zeros((N_TASKS,), jnp.float32)))
            hid = dev_input((N_TASKS, batch, N, C))
            kv = (dev_input((N_TASKS, batch, N, C), 1),
                  dev_input((N_TASKS, batch, N, C), 2))

            def f(x, p):
                bp, pkv = p

                def one(mi, h):
                    bias = jnp.where(jnp.arange(N_TASKS) == mi, -1e9,
                                     0.0).astype(jnp.float32)
                    return bank.apply(bp, h, None, mi, None, task_kv=pkv,
                                      task_key_bias=bias)
                return jax.vmap(one, in_axes=(0, 0))(jnp.arange(N_TASKS), x)

            chain = make_chain(f)
            per = timed_slope(lambda n: chain(n, hid, (params, kv)), iters)
            # per stream: Q-MLP 2N(C*640 + 2*640^2 + 640*C) + out 2NC^2
            # + attn 4NTC; x7 streams x batch
            q_mlp = 2.0 * N * (C * 640 + 2 * 640 * 640 + 640 * C)
            fl = N_TASKS * batch * (q_mlp + 2.0 * N * C * C
                                    + 4.0 * N * N_TASKS * C)
            report(f"taskattn_s{si}_n{N}_c{C}", per, fl / 1e12)

        if "kv" in parts:
            # the shared K/V tables for this stage (built once per layer,
            # all 7 tasks): LN_t -> MLP(C -> C/2 -> C) for k and v
            bank = TaskAttentionBank(dim=C, n_tasks=N_TASKS, dtype=dtype,
                                     fast_math=fast)
            hid_t = jnp.zeros((1, 1, C), dtype)
            feats_t = jnp.zeros((N_TASKS - 1, 1, 1, C), dtype)
            params = bank.init(jax.random.PRNGKey(0), hid_t, feats_t,
                               jnp.asarray(0), jnp.arange(1, N_TASKS))
            bank_p = jax.device_put(params["params"])
            feats = dev_input((N_TASKS, batch, N, C))

            def fkv(x, p):
                k = _kv_project(p, x, None, "k", dtype, fast_gelu=fast)
                v = _kv_project(p, x, None, "v", dtype, fast_gelu=fast)
                return k.mean() + v.mean()

            chain = make_chain(fkv)
            per = timed_slope(lambda n: chain(n, feats, bank_p), iters)
            fl = N_TASKS * batch * (8.0 * N * C * C)  # 4NC^2 each for k,v
            report(f"kvtables_s{si}_n{N}_c{C}", per, fl / 1e12)


if __name__ == "__main__":
    main()
