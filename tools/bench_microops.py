#!/usr/bin/env python
"""VPU/MXU micro-attribution benches for the UNet-stream gap (round 4).

1. exp2 vs polynomial exp2 (exponent-bit construction + minimax poly on
   the fractional part): the flash kernels' softmax is exp-throughput
   bound at S=4096 (BENCH_NOTES r3: ~8.3 ms of the 9.15 ms kernel is
   exp2 at the measured 282 Gelem/s). If a poly beats the hardware
   transcendental, it goes into the kernels behind a fast_math-tier flag.

2. task-attn Q-MLP (LN + 4-layer 640-hidden MLPv2 with per-stream
   gathered bank weights) vs the same FLOPs as a plain GEGLU FF: the
   per-module table shows 57 vs 130-178 TFLOPS — where does the 2.5x go?
   Variants isolate the suspects: the [7,...] batched-matmul form, the
   LN, the f32->bf16 cast chain, the bias adds.

Timing: chained-fori_loop slope + scalar fetch (bench.py methodology).
Usage: python tools/bench_microops.py [exp2 qmlp]
"""

from __future__ import annotations

import functools
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


def timed_slope(fn, iters=8):
    def run(n):
        t0 = time.perf_counter()
        float(fn(n))
        return time.perf_counter() - t0

    run(1)
    t1, t2 = run(2), run(2 + iters)
    return max((t2 - t1) / iters, 1e-9)


def report(name, per_iter_s, elems=None, flops=None):
    rec = {"component": name, "ms_per_iter": round(per_iter_s * 1000, 3)}
    if elems:
        rec["gelem_per_s"] = round(elems / per_iter_s / 1e9, 1)
    if flops:
        rec["achieved_tflops"] = round(flops / per_iter_s / 1e12, 1)
    print(json.dumps(rec), flush=True)


# ---- polynomial exp2 -------------------------------------------------------

def exp2_poly(x, degree: int):
    """2^x for x in +-126: split int/frac, poly for 2^frac on [0,1),
    exponent via direct f32 bit construction (no second transcendental)."""
    xi = jnp.floor(x)
    f = x - xi                                    # [0, 1)
    if degree == 2:
        c = (0.33711385, 0.65756022, 1.00177529)   # ~1.8e-3 max rel
    elif degree == 3:
        c = (0.07801587, 0.22605866, 0.69584812, 0.99992266)  # ~7.7e-5
    else:  # degree 4
        c = (0.01353328, 0.05201061, 0.24144534, 0.69300269,
             1.00000269)                            # ~2.7e-6
    p = jnp.full_like(f, c[0])
    for ci in c[1:]:
        p = p * f + ci
    n = xi.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        ((n + 127) << 23).astype(jnp.int32), jnp.float32)
    return p * scale


def bench_exp2():
    shape = (28 * 5, 2048, 512)   # ~147M elems, f32 (the softmax domain)
    elems = int(np.prod(shape))
    x0 = jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(0), shape, jnp.float32, -40.0, 40.0))()

    def chain_of(f):
        @jax.jit
        def chain(n, x):
            def body(_, carry):
                x, acc = carry
                y = f(x)
                s = y.mean()
                return x + s * 1e-20, acc + s

            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc

        return chain

    for name, f in [
        ("exp2_builtin", jnp.exp2),
        ("exp_builtin", jnp.exp),
        ("exp2_poly4", functools.partial(exp2_poly, degree=4)),
        ("exp2_poly3", functools.partial(exp2_poly, degree=3)),
        ("exp2_poly2", functools.partial(exp2_poly, degree=2)),
        ("mul_ref", lambda x: x * 1.0000001),      # simple-op roofline
    ]:
        ch = chain_of(f)
        per = timed_slope(lambda n: ch(n, x0))
        report(name, per, elems=elems)

    # numeric check of the polys on device (reduce to scalars; never fetch
    # arrays through the tunnel). x passed as an ARGUMENT — closing over it
    # bakes 147M constants into the HLO and the remote compile rejects the
    # body (HTTP 413).
    err_fn = jax.jit(lambda x, d: jnp.max(jnp.abs(
        exp2_poly(x, d) / jnp.exp2(x) - 1.0)), static_argnums=1)
    for deg in (2, 3, 4):
        print(json.dumps({"component": f"exp2_poly{deg}_max_rel_err",
                          "value": float(err_fn(x0, deg))}), flush=True)


# ---- task-attn Q-MLP attribution ------------------------------------------

def bench_qmlp():
    S, B, N, C, H = 7, 4, 4096, 320, 640
    dt = jnp.bfloat16
    r = np.random.RandomState(0)

    def dev(shape, k):
        return jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(k), shape, dt))()

    x = dev((S, B, N, C), 0)
    ws = [jnp.asarray(r.standard_normal((S, a, b)) * 0.02, dt)
          for a, b in ((C, H), (H, H), (H, H), (H, C))]
    bs = [jnp.zeros((S, b), dt) for b in (H, H, H, C)]
    ln_s = jnp.ones((S, C), jnp.float32)
    ln_b = jnp.zeros((S, C), jnp.float32)
    flops = 2.0 * S * B * N * (C * H + H * H + H * H + H * C)

    def ln(h, s, b):
        hf = h.astype(jnp.float32)
        mu = hf.mean(-1, keepdims=True)
        var = hf.var(-1, keepdims=True)
        return ((hf - mu) * jax.lax.rsqrt(var + 1e-5)
                * s[:, None, None] + b[:, None, None]).astype(h.dtype)

    def gelu(h):
        return jax.nn.gelu(h, approximate=True)

    def mlp_full(x, ws, bs):      # production form: LN + f32-acc + bias
        h = ln(x, ln_s, ln_b)
        for i, (w, b) in enumerate(zip(ws, bs)):
            h = jnp.einsum("sbnc,scd->sbnd", h, w,
                           preferred_element_type=jnp.float32).astype(dt)
            h = h + b[:, None, None, :]
            if i < 3:
                h = gelu(h)
        return h

    def mlp_noln(x, ws, bs):
        h = x
        for i, (w, b) in enumerate(zip(ws, bs)):
            h = jnp.einsum("sbnc,scd->sbnd", h, w,
                           preferred_element_type=jnp.float32).astype(dt)
            h = h + b[:, None, None, :]
            if i < 3:
                h = gelu(h)
        return h

    def mlp_flat(x, ws, bs):      # fold (b n) so each stream is one matmul
        h = x.reshape(S, B * N, C)
        for i, (w, b) in enumerate(zip(ws, bs)):
            h = jnp.einsum("stc,scd->std", h, w,
                           preferred_element_type=jnp.float32).astype(dt)
            h = h + b[:, None, :]
            if i < 3:
                h = gelu(h)
        return h.reshape(S, B, N, -1)

    def mlp_bf16acc(x, ws, bs):   # accumulate in bf16 (accuracy cost)
        h = x
        for i, (w, b) in enumerate(zip(ws, bs)):
            h = jnp.einsum("sbnc,scd->sbnd", h, w) + b[:, None, None, :]
            if i < 3:
                h = gelu(h)
        return h

    def chain_of(f):
        @jax.jit
        def chain(n, x, ws, bs):
            def body(_, carry):
                x, acc = carry
                y = f(x, ws, bs)
                s = y.mean().astype(jnp.float32)
                return x + (s * 1e-6).astype(x.dtype), acc + s

            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc

        return chain

    for name, f in [("qmlp_full", mlp_full), ("qmlp_noln", mlp_noln),
                    ("qmlp_flat", mlp_flat), ("qmlp_bf16acc", mlp_bf16acc)]:
        ch = chain_of(f)
        per = timed_slope(lambda n: ch(n, x, ws, bs))
        report(name, per, flops=flops)


# ---- task-attn score/softmax/PV chain attribution --------------------------

def bench_taskchain(stage: int = 0):
    """The task-attention EINSUM CHAIN (scores -> bias -> softmax -> P@V) at
    the production layout: q batched per stream under vmap, K/V tables
    shared UNBATCHED (transformer.py:233-261). The Q-MLP measures near-peak
    in isolation (qmlp_full, 169 TFLOPS) while the whole bank sits at ~57,
    so the residual must live here: the einsums contract d=C/4 per head
    with only T=7 outputs — MXU tiles pad 7x80x7 to 128x128x128 (~60x
    waste) if XLA picks the MXU, or it pays broadcast re-reads on the VPU.
    Variants probe the fixes available WITHOUT a custom kernel:

    - prod:   exact production einsum pair.
    - bmr:    broadcast-mul-reduce (forces VPU loop fusion, no MXU padding).
    - half:   production scores einsum + bmr P@V (mixed).
    - f32all: prod with f32 probs kept through P@V (cast-cost check).
    """
    S, B, N, C, h, T = 7, 4, 4096 // (4 ** stage), 320 * (2 ** stage), 4, 7
    d = C // h
    dt = jnp.bfloat16

    def dev(shape, k, dtype=dt):
        return jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(k), shape, dtype))()

    q = dev((S, B, N, h, d), 0)          # per-stream, post-Q-MLP, head-split
    kt = dev((T, B, N, h, d), 1)         # shared tables (unbatched)
    vt = dev((T, B, N, h, d), 2)
    # per-stream key bias: -inf on the main task (task_kv sharing layout)
    bias = jnp.where(jnp.arange(T)[None, :] == jnp.arange(S)[:, None],
                     -1e9, 0.0).astype(jnp.float32)
    scale = 1.0 / np.sqrt(d)

    def chain_prod(q, kt, vt):
        def one(qs, bs):
            s = jnp.einsum("bnhd,tbnhd->bnht", qs, kt,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s + bs, axis=-1).astype(dt)
            return jnp.einsum("bnht,tbnhd->bnhd", p, vt,
                              preferred_element_type=jnp.float32).astype(dt)
        return jax.vmap(one)(q, bias)

    def chain_bmr(q, kt, vt):
        def one(qs, bs):
            # [T,B,N,h] f32 scores via fused mul+reduce (no MXU padding)
            s = (qs[None].astype(jnp.float32)
                 * kt.astype(jnp.float32)).sum(-1) * scale
            s = s + bs[:, None, None, None]
            p = jax.nn.softmax(s, axis=0).astype(dt)
            return (p[..., None] * vt).sum(0)
        return jax.vmap(one)(q, bias)

    def chain_half(q, kt, vt):
        def one(qs, bs):
            s = jnp.einsum("bnhd,tbnhd->bnht", qs, kt,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s + bs, axis=-1).astype(dt)
            pt = jnp.moveaxis(p, -1, 0)              # [T,B,N,h]
            return (pt[..., None] * vt).sum(0)
        return jax.vmap(one)(q, bias)

    def chain_wired(q, kt, vt):
        # the module-wiring candidate: bmr for BOTH einsums, but scores
        # kept in the production [B,N,h,T] orientation (via cheap
        # small-tensor transposes) so the stochastic-mask machinery in
        # transformer.py stays untouched
        def one(qs, bs):
            st = (qs[None].astype(jnp.float32)
                  * kt.astype(jnp.float32)).sum(-1) * scale   # [T,B,N,h]
            st = st + bs[:, None, None, None]
            s = jnp.moveaxis(st, 0, -1)                       # [B,N,h,T]
            p = jax.nn.softmax(s, axis=-1)
            pt = jnp.moveaxis(p, -1, 0)                       # [T,B,N,h] f32
            return (pt[..., None]
                    * vt.astype(jnp.float32)).sum(0).astype(dt)
        return jax.vmap(one)(q, bias)

    def chain_f32all(q, kt, vt):
        def one(qs, bs):
            s = jnp.einsum("bnhd,tbnhd->bnht", qs, kt,
                           preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s + bs, axis=-1)
            return jnp.einsum("bnht,tbnhd->bnhd", p,
                              vt.astype(jnp.float32)).astype(dt)
        return jax.vmap(one)(q, bias)

    def chain_of(f):
        @jax.jit
        def chain(n, q, kt, vt):
            def body(_, carry):
                q, acc = carry
                y = f(q, kt, vt)
                sm = y.mean().astype(jnp.float32)
                return q + (sm * 1e-6).astype(q.dtype), acc + sm

            _, acc = jax.lax.fori_loop(0, n, body, (q, jnp.float32(0)))
            return acc

        return chain

    # useful FLOPs only (what the 'achieved' number should credit):
    # scores 2*S*T*B*N*C + PV the same
    fl = 4.0 * S * T * B * N * C
    for name, f in [("taskchain_prod", chain_prod),
                    ("taskchain_bmr", chain_bmr),
                    ("taskchain_wired", chain_wired),
                    ("taskchain_half", chain_half),
                    ("taskchain_f32all", chain_f32all)]:
        ch = chain_of(f)
        per = timed_slope(lambda n: ch(n, q, kt, vt))
        report(f"{name}_s{stage}", per, flops=fl)

    # numeric guard: bmr == prod (same math, different association)
    diff = jax.jit(lambda q, kt, vt: jnp.max(jnp.abs(
        chain_prod(q, kt, vt).astype(jnp.float32)
        - chain_bmr(q, kt, vt).astype(jnp.float32))))(q, kt, vt)
    print(json.dumps({"component": f"taskchain_bmr_vs_prod_s{stage}",
                      "max_abs_diff": float(diff)}), flush=True)


# ---- text cross-attention: L=4 keys, same tiny-key pathology --------------

def bench_xattn(stage: int = 0):
    """Text cross-attention core at production shapes: S queries against
    L=4 text tokens (the 7-task embedding table rows are length-4). The
    QK/PV dot_generals contract d=64 with only L=4 outputs — the same
    MXU-tile padding the task-attn chain had. Variants:

    - prod: jax.nn.dot_product_attention (the dispatch default at L<1024).
    - einsum: the _xla_attention einsum pair.
    - bmr: keys-major broadcast-mul-reduce (no MXU, no padding).
    """
    B, S, h, d = 28, 4096 // (4 ** stage), 5 * (2 ** stage), 64
    L = 4
    dt = jnp.bfloat16

    def dev(shape, key):
        return jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(key), shape, dt))()

    q = dev((B, S, h, d), 0)
    k = dev((B, L, h, d), 1)
    v = dev((B, L, h, d), 2)
    scale = 1.0 / np.sqrt(d)

    def core_prod(q, k, v):
        return jax.nn.dot_product_attention(q, k, v)

    def core_einsum(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                          preferred_element_type=jnp.float32).astype(dt)

    def core_bmr(q, k, v):
        # [B, L, S, h] f32 scores; softmax over the leading key axis
        s = (q[:, None].astype(jnp.float32)
             * k[:, :, None].astype(jnp.float32)).sum(-1) * scale
        p = jax.nn.softmax(s, axis=1).astype(dt)
        return (p[..., None] * v[:, :, None]).sum(1)

    def chain_of(f):
        @jax.jit
        def chain(n, q, k, v):
            def body(_, carry):
                q, acc = carry
                y = f(q, k, v)
                sm = y.mean().astype(jnp.float32)
                return q + (sm * 1e-6).astype(q.dtype), acc + sm

            _, acc = jax.lax.fori_loop(0, n, body, (q, jnp.float32(0)))
            return acc

        return chain

    fl = 4.0 * B * S * L * h * d
    for name, f in [("xattn_prod", core_prod), ("xattn_einsum", core_einsum),
                    ("xattn_bmr", core_bmr)]:
        ch = chain_of(f)
        per = timed_slope(lambda n: ch(n, q, k, v))
        report(f"{name}_s{stage}", per, flops=fl)

    diff = jax.jit(lambda q, k, v: jnp.max(jnp.abs(
        core_einsum(q, k, v).astype(jnp.float32)
        - core_bmr(q, k, v).astype(jnp.float32))))(q, k, v)
    print(json.dumps({"component": f"xattn_bmr_vs_einsum_s{stage}",
                      "max_abs_diff": float(diff)}), flush=True)


# ---- GEGLU feed-forward: fused Pallas epilogue vs plain XLA ----------------

def bench_geglu(stage: int = 0):
    """FeedForward GEGLU projection at the production UNet-stream shapes
    (28 streams = 7 tasks x batch 4, bf16, tanh gelu = fast_math tier).
    A/B the plain XLA formulation (materializes [R, 2F] in HBM) against
    ops/geglu.py's fused Pallas kernel (gated-gelu epilogue in VMEM).
    """
    from stablemtl_tpu.ops.geglu import geglu_proj

    B = 28
    N = 4096 // (4 ** stage)
    C = 320 * (2 ** stage)
    F = 4 * C
    dt = jnp.bfloat16

    def dev(shape, key):
        return jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(key), shape, dt) * 0.05)()

    x = dev((B, N, C), 0)
    kernel = dev((C, 2 * F), 1)
    bias = dev((2 * F,), 2)

    def chain_of(use_fused):
        @jax.jit
        def chain(n, x, kernel, bias):
            def body(_, carry):
                x, acc = carry
                y = geglu_proj(x, kernel, bias, fast_gelu=True,
                               use_fused=use_fused)
                sm = y.mean().astype(jnp.float32)
                return x + (sm * 1e-6).astype(x.dtype), acc + sm

            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc

        return chain

    fl = 4.0 * B * N * C * F          # both half-projections
    for name, fused in [("geglu_plain", False), ("geglu_fused", True)]:
        ch = chain_of(fused)
        per = timed_slope(lambda n: ch(n, x, kernel, bias))
        report(f"{name}_s{stage}", per, flops=fl)

    diff = jax.jit(lambda x, kernel, bias: jnp.max(jnp.abs(
        geglu_proj(x, kernel, bias, fast_gelu=True,
                   use_fused=True).astype(jnp.float32)
        - geglu_proj(x, kernel, bias, fast_gelu=True,
                     use_fused=False).astype(jnp.float32))))(x, kernel, bias)
    print(json.dumps({"component": f"geglu_fused_vs_plain_s{stage}",
                      "max_abs_diff": float(diff)}), flush=True)


if __name__ == "__main__":
    parts = sys.argv[1:] or ["exp2", "qmlp"]
    if "exp2" in parts:
        bench_exp2()
    if "qmlp" in parts:
        bench_qmlp()
    if "taskchain" in parts:
        bench_taskchain(0)
        bench_taskchain(1)
    if "xattn" in parts:
        bench_xattn(0)
        bench_xattn(1)
    geglu_stages = []            # dedupe "geglu" + "gegluN" (ADVICE r4)
    if "geglu" in parts:
        geglu_stages = [0, 1, 2]
    else:
        geglu_stages = [s for s in (0, 1, 2) if f"geglu{s}" in parts]
    for s in geglu_stages:       # single-stage runs (slow-tunnel friendly)
        bench_geglu(s)
