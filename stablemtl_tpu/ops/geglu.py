"""Pallas fused GEGLU projection (matmul with a gated-gelu epilogue).

The reference's FeedForward GEGLU (diffusers GEGLU; consumed via
src/model/attention.py:226-380 BasicTransformerBlock `ff`) computes
``h, gate = (x @ W).chunk(2); y = h * gelu(gate)``. Left to XLA, the
``[R, 2F]`` projection output is materialized in HBM, read back by the
split/gelu/mul fusion, and the gated half written again — at the stage-0
production shape ([7*4, 4096, 320] -> F=1280, bf16) that is ~1.4 GB of
avoidable HBM traffic per layer invocation on top of the ~0.3 GB the
math needs.

This kernel computes both halves of the projection per (row-block,
F-block) grid cell on the MXU (f32 accumulation) and applies
``h * gelu(g)`` in VMEM before the single ``[R, F]`` write.

AD: the kernel is the custom_vjp PRIMAL only (inference). Under
differentiation the forward falls back to the plain XLA formulation via
``jax.vjp`` — gradients are exactly the plain path's (bit-equal), and the
training step keeps XLA's own scheduling (with remat on, training
recomputes activations anyway).

Trace-time switch: STABLEMTL_FUSED_GEGLU — **measured dead end, off at
every tier** (on-chip A/B 2026-08-20, BENCH_NOTES r5): the plain XLA
path wins at all three production stages (s0 1.48 vs 1.78 ms, s1 0.86
vs 1.21, s2 1.07 vs 1.31). XLA never materializes the [R, 2F]
intermediate this docstring's HBM argument assumed — it fuses the
gated-gelu epilogue into the split projection itself (the s1 plain leg
sustains ~218 nominal TFLOPS, above bf16 peak, impossible with the
round-trip). Kept (with tests) as the recorded experiment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _fused_geglu_enabled() -> bool:
    from ..utils.env import env_flag

    return env_flag("STABLEMTL_FUSED_GEGLU")


def _gelu(x, fast: bool):
    return jax.nn.gelu(x, approximate=fast)


def _plain_geglu(x, wh, wg, bh, bg, *, fast_gelu: bool):
    """Reference math (matches models/layers.GEGLU exactly: the dot over
    the concatenated weight equals two dots over its column halves)."""
    h = jnp.dot(x, wh) + bh
    g = jnp.dot(x, wg) + bg
    return h * _gelu(g, fast_gelu)


def _geglu_kernel(x_ref, wh_ref, wg_ref, bh_ref, bg_ref, o_ref, *,
                  fast_gelu: bool):
    # both half-projections on the MXU in the input dtype with f32
    # accumulation; bias add + gelu + gate multiply stay f32 in VMEM and
    # only the gated product is written back (the [R, 2F] intermediate of
    # the unfused path never exists)
    x = x_ref[...]                                    # [Bn, C]
    h = jax.lax.dot_general(x, wh_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(x, wg_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + bh_ref[...].astype(jnp.float32)           # [1, Bf] broadcasts
    g = g + bg_ref[...].astype(jnp.float32)
    o_ref[...] = (h * _gelu(g, fast_gelu)).astype(o_ref.dtype)


def _divisor_block(n: int, cap: int, step: int) -> int:
    """Largest divisor of n that is <= cap and a multiple of step."""
    best = 0
    for b in range(step, min(cap, n) + 1, step):
        if n % b == 0:
            best = b
    return best


def _pick_blocks(rows: int, c: int, f: int, itemsize: int):
    """(block_rows, block_f) fitting the VMEM budget, or None.

    Prefers the largest F block (fewer re-reads of x) then the largest
    row block that fits. Estimate counts double buffering on every
    operand (Pallas revolves 2 buffers per input/output block).
    """
    bf = _divisor_block(f, 2048, 128)
    while bf:
        bn = _divisor_block(rows, 1024, 8)
        while bn:
            est = (bn * c * itemsize * 2          # x block
                   + 2 * c * bf * itemsize * 2    # both weight halves
                   + 2 * bn * bf * 4              # f32 h/g accumulators
                   + bn * bf * itemsize * 2       # output block
                   + 2 * bf * 4 * 2)              # bias rows
            if est <= VMEM_BUDGET_BYTES:
                return bn, bf
            nxt = _divisor_block(rows, bn - 1, 8)
            if nxt == bn:
                break
            bn = nxt
        nxt = _divisor_block(f, bf - 1, 128)
        if nxt == bf:
            break
        bf = nxt
    return None


def _fused_geglu_2d(x2, wh, wg, bh, bg, *, fast_gelu: bool, blocks):
    rows, c = x2.shape
    f = wh.shape[1]
    bn, bf = blocks
    grid = (f // bf, rows // bn)                      # F outer, rows inner:
    # the weight tiles stay put across the whole inner sweep and x is
    # re-read only (f / bf) times.
    return pl.pallas_call(
        functools.partial(_geglu_kernel, fast_gelu=fast_gelu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, c), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, bf), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, bf), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, bf), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, f), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * c * f,
            bytes_accessed=(x2.size + wh.size + wg.size) * x2.dtype.itemsize
            + rows * f * x2.dtype.itemsize,
            transcendentals=rows * f,
        ),
    )(x2, wh, wg, bh, bg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _geglu_core(fast_gelu, blocks, x2, wh, wg, bh, bg):
    # primal (inference / no differentiation): the fused Pallas kernel
    return _fused_geglu_2d(x2, wh, wg, bh, bg, fast_gelu=fast_gelu,
                           blocks=blocks)


def _geglu_core_fwd(fast_gelu, blocks, x2, wh, wg, bh, bg):
    # AD path: plain XLA forward; gradients are exactly the plain path's
    out, vjp = jax.vjp(
        functools.partial(_plain_geglu, fast_gelu=fast_gelu),
        x2, wh, wg, bh, bg)
    return out, vjp


def _geglu_core_bwd(fast_gelu, blocks, vjp, g):
    return vjp(g)


_geglu_core.defvjp(_geglu_core_fwd, _geglu_core_bwd)


def geglu_proj(x, kernel, bias, fast_gelu: bool = False,
               use_fused: bool | None = None):
    """GEGLU projection ``split(x @ kernel + bias) -> h * gelu(gate)``.

    x: [..., C]; kernel: [C, 2F] (value columns first, gate columns
    second — diffusers GEGLU chunk order); bias: [2F]. Returns [..., F].

    use_fused: force (True) / forbid (False) the Pallas kernel; None =
    auto (STABLEMTL_FUSED_GEGLU flag + TPU backend + supported shape).
    """
    c = x.shape[-1]
    f = kernel.shape[-1] // 2
    wh, wg = kernel[:, :f], kernel[:, f:]
    bh, bg = bias[:f], bias[f:]
    rows = 1
    for dim in x.shape[:-1]:
        rows *= dim

    blocks = None
    if c % 8 == 0 and rows % 8 == 0 and f % 128 == 0:
        blocks = _pick_blocks(rows, c, f, jnp.dtype(x.dtype).itemsize)
    if use_fused and blocks is None:
        # Explicitly forced fused path on an unsupported shape: fail loudly
        # so an A/B can never silently time plain-vs-plain (ADVICE r4).
        raise ValueError(
            f"geglu_proj(use_fused=True): no Pallas block fit for shape "
            f"rows={rows} C={c} F={f} (need rows%8==0, C%8==0, F%128==0 "
            f"and a VMEM-budget block)")
    if use_fused is None:
        use_fused = (_fused_geglu_enabled()
                     and jax.default_backend() == "tpu"
                     and blocks is not None)
    if not use_fused:
        return _plain_geglu(x, wh, wg, bh, bg, fast_gelu=fast_gelu)

    x2 = x.reshape(rows, c)
    # biases as [1, F] rows (2D for TPU block tiling); kept in the input
    # dtype so the AD-path plain forward matches the module math, widened
    # to f32 only inside the kernel epilogue
    out = _geglu_core(fast_gelu, blocks, x2, wh, wg,
                      bh.reshape(1, f), bg.reshape(1, f))
    return out.reshape(*x.shape[:-1], f)
