"""Pallas TPU flash attention (forward kernel, online softmax).

Replaces xformers.ops.memory_efficient_attention of the reference
(src/model/attention.py:395,587) for long self-attention sequences
(latent 64x64 -> 4096 tokens at 512x512 inputs). The kernel never
materializes the [S, S] logits matrix: per (batch*head, q-block) grid cell
it streams K/V blocks from VMEM and maintains the running max / normalizer
/ accumulator of the online-softmax recurrence.

Backward: Pallas kernels as well (jax.custom_vjp): the forward saves a
lane-replicated logsumexp per query row; dQ runs q-block-parallel and
dK/dV k-block-parallel, both streaming the opposite operand in blocks.
Measured ~3.8x faster than XLA fwd+bwd at S=4096 on v5e (BENCH_NOTES.md),
gradients matching the XLA reference to 2e-4.

Shapes are BSHD [batch, seq, heads, head_dim]; head_dim should be a
multiple of 8 (64 for SD2). Falls back to XLA attention when a bias is
given or the sequence has no block-aligned tiling.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_BLOCK = 512
NEG_INF = -1e30
# no_max fast-softmax guard: clamp base-2 scores to +-FAST_CLAMP so a row
# with |logits| beyond ~76 nats degrades gracefully (flattens toward the
# clamp) instead of overflowing exp2 to inf (-> inf/inf = NaN output) or
# fully underflowing to l=0 (-> 0/0). exp2(110) ~ 1.3e33; summed over a
# 4096-token row and multiplied into the accumulator it stays well inside
# f32 range. LayerNormed UNet q/k sit around +-30 nats (~43 in base 2), so
# the clamp is never active on the shapes this flag targets.
FAST_CLAMP = 110.0
LANE = 8  # lane width for saved per-row vectors (lse/delta)
LOG2E = 1.4426950408889634  # softmax runs in base 2: exp2 is ~1.6x exp on
# the VPU (measured, BENCH_NOTES.md) and the log2(e) factor folds into the
# existing score scale for free. All statistics (m, l, lse) live in the
# base-2 domain; probabilities exp2(s2 - m2) == exp(s - m) are identical,
# and the gradient formulas are unchanged (d/dq exp2(q.k*scale*LOG2E) =
# p * k * scale, the LOG2E*ln2 factors cancel).


def _fast_softmax() -> bool:
    """Trace-time switch: drop the online running max from the forward
    kernels (exact while |logits| < ~76 nats, clamped beyond; backward is
    max-subtracting regardless). Defaults to the STABLEMTL_FAST_MATH tier
    — measured on chip (BENCH_NOTES r4): fwd 10.20->9.15 ms at the S=4096
    H=5 x28 production shape and 1.52->1.23 ms at S=1024 H=10, fwd+bwd
    21.9->20.6 / 3.36->3.15 ms. STABLEMTL_FLASH_FAST_SOFTMAX=0/1
    overrides the tier either way."""
    from ..utils.env import env_flag

    return env_flag("STABLEMTL_FLASH_FAST_SOFTMAX",
                    default=env_flag("STABLEMTL_FAST_MATH"))


def _poly_exp() -> int:
    """Trace-time switch: STABLEMTL_FLASH_POLY_EXP = 0 (off) | 3 | 4 —
    replace the kernels' exp2 transcendental with a degree-3/4 minimax
    polynomial on the fractional part plus direct exponent-bit
    construction (no transcendental at all). The VPU's exp2 unit is the
    measured floor of the S=4096 softmax chain; a polynomial runs on the
    plain ALU lanes instead. Max relative error: 7.7e-5 (deg 3) /
    2.7e-6 (deg 4) — the probabilities are cast to bf16 (~4e-3 ulp) for
    the P@V matmul anyway. Forward kernels only; the backward recomputes
    p with the exact exp2 (gradient parity stays at the 2e-4 test bar)."""
    import os

    val = os.environ.get("STABLEMTL_FLASH_POLY_EXP", "0").strip()
    return int(val) if val in ("3", "4") else 0


# minimax-ish (iteratively reweighted LSQ) coefficients for 2^f, f in [0,1)
_EXP2_POLY_COEFFS = {
    3: (0.07801587, 0.22605866, 0.69584812, 0.99992266),
    4: (0.01353328, 0.05201061, 0.24144534, 0.69300269, 1.00000269),
}


def _exp2_fast(x, degree: int):
    """2^x for f32 x in [-126, 127]: 2^floor(x) * poly(frac(x)).

    The 2^n factor is built directly in the f32 exponent bits
    ((n+127) << 23 bitcast to float), so the whole thing is floor + sub +
    `degree` FMAs + int convert/shift/add + bitcast + mul on plain VPU
    lanes — no transcendental. The lower clamp makes deeply-negative
    arguments (the running-max path feeds m_prev - m_cur = -1e30 on the
    first block, where exp2 must return ~0) land on 2^-126 ~= 1.2e-38
    instead of overflowing the int32 exponent construction."""
    x = jnp.maximum(x, -126.0)
    xi = jnp.floor(x)
    f = x - xi
    c = _EXP2_POLY_COEFFS[degree]
    p = jnp.full_like(f, c[0])
    for ci in c[1:]:
        p = p * f + ci
    n = xi.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type((n + 127) << 23, jnp.float32)
    return p * scale


def _make_exp2(poly_deg: int):
    """The forward kernels' exp2: hardware transcendental or polynomial."""
    if poly_deg:
        return functools.partial(_exp2_fast, degree=poly_deg)
    return jnp.exp2


def _mxu_lsum() -> bool:
    """Trace-time switch: STABLEMTL_FLASH_MXU_LSUM=1 appends a ones column
    to V so the softmax normalizer rides the P@V matmul (MXU) instead of a
    VPU row-sum over every score element.

    Scope: the RESIDENT kernel only (all UNet self-attention). The
    K/V-streaming kernel (single-head d=512 VAE attention) ignores it —
    its d+1=513 column would pad a whole extra lane tile, and that path is
    MXU-starved already. Applied only when head_dim < 128 so the extra
    column rides the existing lane padding (d=64 pads to 128 lanes with or
    without it); at d>=128 it would double V's VMEM tile."""
    from ..utils.env import env_flag

    return env_flag("STABLEMTL_FLASH_MXU_LSUM")


def _pick_block(s: int, max_block: int = MAX_BLOCK,
                env: str | None = None) -> int:
    """Largest divisor of s that is <= max_block and a multiple of 8.

    env names a trace-time override (STABLEMTL_FLASH_BLOCK_Q/_BLOCK_K)
    for on-chip block sweeps (tools/bench_flash_variants.py); the value
    still must divide s or it falls back to the auto pick."""
    if env:
        raw = os.environ.get(env, "").strip()
        if raw.isdigit() and int(raw) > 0 and s % int(raw) == 0:
            return int(raw)
    best = 0
    for b in range(8, min(max_block, s) + 1, 8):
        if s % b == 0:
            best = b
    return best


# k-block cap for the resident kernels. Larger k-blocks amortize the
# online-softmax flush (fewer rescale/accumulate rounds, bigger P@V
# matmuls): measured on chip r5 (BENCH_NOTES) at the production shapes,
# S=4096 fwd 9.09 -> 6.96 ms and fwd+bwd 20.7 -> 17.2 at bk=sk (single
# pass); S=1024 fwd 1.37 -> 1.03 at bk=sk. Capped by the VMEM budget:
# the picker below degrades bk until the [block_q, bk] f32 score tile
# plus resident K/V fit, so long sequences keep the resident kernel
# instead of spilling to the streaming one.
MAX_BLOCK_K = 4096


def _pick_block_k(sk: int, block_q: int, d: int, itemsize: int,
                  env: str | None = None) -> int:
    """Largest k-block (divisor of sk, <= MAX_BLOCK_K, multiple of 8)
    whose resident-kernel VMEM estimate fits VMEM_BUDGET_BYTES; falls
    back to the classic 512-cap pick when nothing larger fits. The env
    override (STABLEMTL_FLASH_BLOCK_K) bypasses the budget for sweeps."""
    if env:
        raw = os.environ.get(env, "").strip()
        if raw.isdigit() and int(raw) > 0 and sk % int(raw) == 0:
            return int(raw)
    kv = sk * 2 * d * itemsize * 2          # K + V, double-buffered
    q_acc = block_q * d * itemsize + block_q * d * 4
    best = 0
    for b in range(8, min(MAX_BLOCK_K, sk) + 1, 8):
        if sk % b == 0 and (kv + 2 * q_acc
                            + block_q * b * 4) <= VMEM_BUDGET_BYTES:
            best = b
    return best if best else _pick_block(sk)


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int,
               scale: float, no_max: bool = False, mxu_lsum: bool = False,
               poly_deg: int = 0):
    # Matmuls run in the INPUT dtype with f32 accumulation: the MXU's
    # bf16xbf16->f32 path is ~4x the f32 matmul throughput on v5e, and
    # softmax statistics / the accumulator stay f32 regardless. The scale
    # is applied to the f32 scores (not pre-multiplied into a bf16 q,
    # which would round it away).
    #
    # no_max (STABLEMTL_FLASH_FAST_SOFTMAX): drop the running row max —
    # p = exp2(s) directly. The softmax VPU chain (max reduce + exp2 +
    # sum reduce) is the kernel's floor at these shapes (BENCH_NOTES.md);
    # removing the max reduce and the acc rescale cuts a third of it.
    # Numerically exact-in-f32 while |logits| < ~87 nats (exp2 argument
    # within f32 range); LayerNormed q/k in trained diffusion UNets sit
    # around +-30. The saved lse = log2(sum exp2(s)) is the same true
    # logsumexp, so the (max-subtracting) backward is unchanged.
    #
    # mxu_lsum (STABLEMTL_FLASH_MXU_LSUM): the caller appends a ones
    # column to V, so the softmax normalizer accumulates as acc[:, d]
    # inside the P@V matmul (MXU, where d<=64 heads waste the lane tile
    # anyway) instead of a VPU row-sum over every score element. l obeys
    # the same rescale recurrence as acc, so this composes with either
    # softmax mode; exact for f32 inputs, one bf16 rounding of p for bf16.
    q = q_ref[0]                                      # [Bq, D]
    bq, d = q.shape
    dv = v_ref.shape[-1]                              # d (+1 when mxu_lsum)
    s_len = k_ref.shape[1]
    nk = s_len // block_k

    scale2 = scale * LOG2E
    e2 = _make_exp2(poly_deg)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale2  # [Bq, Bk] f32
        if no_max:
            m_cur = m_prev
            p = e2(jnp.clip(s, -FAST_CLAMP, FAST_CLAMP))
        else:
            m_cur = jnp.maximum(m_prev, s.max(axis=-1))
            p = e2(s - m_cur[:, None])
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if no_max:
            acc = acc + pv
            l_cur = l_prev if mxu_lsum else l_prev + p.sum(axis=-1)
        else:
            alpha = e2(m_prev - m_cur)
            acc = acc * alpha[:, None] + pv
            l_cur = (l_prev * alpha if mxu_lsum
                     else l_prev * alpha + p.sum(axis=-1))
        return m_cur, l_cur, acc

    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, dv), jnp.float32)
    m0 = (jnp.zeros((bq,), jnp.float32) if no_max
          else jnp.full((bq,), NEG_INF, jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    if mxu_lsum:
        l = acc[:, d]
        o = acc[:, :d] / l[:, None]
    else:
        o = acc / l[:, None]
    o_ref[0] = o.astype(o_ref.dtype)
    if lse_ref is not None:
        # base-2 logsumexp per query row (softmax denominators for the
        # backward); stored lane-replicated [Bq, LANE] for TPU block tiling
        lse = m + jnp.log2(l)
        lse_ref[0] = jnp.broadcast_to(lse[:, None], (bq, LANE))


def _fa_kernel_nolse(q_ref, k_ref, v_ref, o_ref, **kw):
    """Forward without the logsumexp output: the inference path (custom_vjp
    primal, never differentiated) doesn't need the backward's residual, so
    skip its log2 and — more importantly — its lane-replicated [Sq, 128]
    f32 HBM write (2x the size of the output itself at d=64)."""
    _fa_kernel(q_ref, k_ref, v_ref, o_ref, None, **kw)


def _fa_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                  *, block_k: int, scale: float):
    """dQ for one (batch*head, q-block): dQ = scale * [P o (dO K^T-ish)].

    dS = P o (dP - delta) with dP = dO V^T, delta = rowsum(dO o O);
    dQ = dS K * scale (flash attention 2 backward, q-parallel part).
    """
    q = q_ref[0]                                      # [Bq, D] input dtype
    do = do_ref[0]
    lse = lse_ref[0, :, 0]                            # [Bq] (lane 0)
    delta = delta_ref[0, :, 0]
    bq, d = q.shape
    nk = k_ref.shape[1] // block_k

    scale2 = scale * LOG2E

    def body(i, dq):
        # dots in the input dtype (bf16 MXU path), f32 accumulation; the
        # probability/score intermediates stay f32
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale2
        p = jnp.exp2(s - lse[:, None])                # [Bq, Bk] f32
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None])
        return dq + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, nk, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _fa_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dk_ref, dv_ref, *, block_q: int, scale: float):
    """dK, dV for one (batch*head, k-block), looping over q blocks."""
    # dots in the input dtype (bf16 MXU path), f32 accumulation; the
    # probability/score intermediates stay f32
    k = k_ref[0]                                      # [Bk, D] input dtype
    v = v_ref[0]
    bk, d = k.shape
    nq = q_ref.shape[1] // block_q
    scale2 = scale * LOG2E

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), 0]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale2
        p = jnp.exp2(s - lse[:, None])                # [Bq, Bk] f32
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None])                # [Bq, Bk] f32
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _fold(x):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _unfold(x, b, h):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _flash_forward(q, k, v, want_lse: bool = True):
    """q,k,v: [B, S, H, D] (kv seq may differ from q seq).

    Returns (out [B,Sq,H,D], lse [B*H, Sq]) — lse saved for the backward.
    want_lse=False (the inference/primal path) runs a kernel without the
    lse output: skips its log2 and the lane-replicated [Sq, 128] f32 HBM
    write, which at d=64 is 2x the bytes of the output itself; returns
    (out, None).
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = _pick_block(sq, env="STABLEMTL_FLASH_BLOCK_Q")
    block_k = _pick_block_k(sk, block_q, d, q.dtype.itemsize,
                            env="STABLEMTL_FLASH_BLOCK_K")

    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    scale = float(d) ** -0.5
    # d >= 128: the +1 column would spill into a fresh 128-lane tile,
    # doubling V VMEM and the P@V tile cost — not worth the VPU saving
    mxu_lsum = _mxu_lsum() and d < 128
    if mxu_lsum:
        vf = jnp.concatenate(
            [vf, jnp.ones((b * h, sk, 1), vf.dtype)], axis=-1)
    dv = d + 1 if mxu_lsum else d
    kernel = functools.partial(
        _fa_kernel if want_lse else _fa_kernel_nolse,
        block_k=block_k, scale=scale,
        no_max=_fast_softmax(), mxu_lsum=mxu_lsum, poly_deg=_poly_exp())
    grid = (b * h, sq // block_q)

    o_spec = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct((b * h, sq, d), q.dtype)
    lse_spec = pl.BlockSpec((1, block_q, LANE), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    lse_shape = jax.ShapeDtypeStruct((b * h, sq, LANE), jnp.float32)

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(o_spec, lse_spec) if want_lse else o_spec,
        out_shape=(o_shape, lse_shape) if want_lse else o_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf)
    out, lse = res if want_lse else (res, None)
    return _unfold(out, b, h), lse


def _flash_backward(q, k, v, out, lse, g):
    """Pallas flash backward: returns (dq, dk, dv), all [B,S,H,D]."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = _pick_block(sq, env="STABLEMTL_FLASH_BLOCK_Q")
    # the BACKWARD keeps the classic 512-cap k-blocks: its kernels hold
    # THREE [block_q, block_k] f32 score-sized tiles at once (s/p, dp,
    # ds) plus the dk/dv accumulators, so the forward's full-K pick
    # blows the 16 MB scoped-VMEM stack (measured r5: bk=4096 asked for
    # 27.25 MB and failed the train-step compile; bk=512 is proven).
    # Sweep override is a separate env so fwd/bwd can be varied apart.
    block_k = _pick_block(sk, env="STABLEMTL_FLASH_BLOCK_K_BWD")
    scale = float(d) ** -0.5

    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    dof = _fold(g)
    # delta = rowsum(dO o O) — cheap elementwise, computed in XLA;
    # lane-replicated like lse
    delta = jnp.sum(dof.astype(jnp.float32)
                    * _fold(out).astype(jnp.float32), axis=-1)  # [BH, Sq]
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (LANE,))

    qspec = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    qfull = pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kfull = pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    vec_q = pl.BlockSpec((1, block_q, LANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    vec_qfull = pl.BlockSpec((1, sq, LANE), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_fa_dq_kernel, block_k=block_k, scale=scale),
        grid=(b * h, sq // block_q),
        in_specs=[qspec, kfull, kfull, qspec, vec_q, vec_q],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
    )(qf, kf, vf, dof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_fa_dkv_kernel, block_q=block_q, scale=scale),
        grid=(b * h, sk // block_k),
        in_specs=[qfull, kspec, kspec, qfull, vec_qfull, vec_qfull],
        out_specs=(kspec, kspec),
        out_shape=(jax.ShapeDtypeStruct((b * h, sk, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, sk, d), v.dtype)),
    )(qf, kf, vf, dof, lse, delta)

    return (_unfold(dq, b, h), _unfold(dk, b, h), _unfold(dv, b, h))


def _xla_reference(q, k, v):
    # single source of truth for the reference math (dedup: a precision
    # fix there must also reach this vjp fallback)
    from .attention import _xla_attention

    return _xla_attention(q, k, v)


@jax.custom_vjp
def _flash(q, k, v):
    # primal path (inference / no differentiation): custom_vjp only calls
    # _flash_fwd under AD, so this variant can skip the lse output
    out, _ = _flash_forward(q, k, v, want_lse=False)
    return out


def _flash_fwd(q, k, v):
    out, lse = _flash_forward(q, k, v)
    return out, (q, k, v, out, lse)


def _flash_bwd(res, g):
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, g)


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# K/V-streaming forward: 3D grid (bh, q-block, k-block), online-softmax
# state carried in VMEM scratch across the innermost (sequential) k axis.
# Nothing seq-sized is resident, so shapes whose full K/V exceed VMEM —
# the single-head d=512 VAE mid attention at seq 4096 — run in Pallas
# instead of falling back to XLA's materialized [S,S] softmax.
# ---------------------------------------------------------------------------

def _fa_stream_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                      acc_scr, *, nk: int, scale: float,
                      no_max: bool = False, poly_deg: int = 0):
    e2 = _make_exp2(poly_deg)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # dots in the input dtype (bf16 MXU path), f32 accumulation; scale is
    # applied to the f32 scores rather than pre-multiplied into a bf16 q
    q = q_ref[0]                                      # [Bq, D]
    k = k_ref[0]                                      # [Bk, D]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (
                                scale * LOG2E)
    if no_max:
        # fixed-max fast softmax (see _fa_kernel no_max note)
        p = e2(jnp.clip(s, -FAST_CLAMP, FAST_CLAMP))
        l_cur = l_scr[:, 0] + p.sum(axis=-1)
        acc_scr[...] = acc_scr[...] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        l_scr[...] = jnp.broadcast_to(l_cur[:, None], l_scr.shape)

        @pl.when(j == nk - 1)
        def _flush_fast():
            o_ref[0] = (acc_scr[...]
                        / l_scr[:, 0][:, None]).astype(o_ref.dtype)
            lse = jnp.log2(l_scr[:, 0])               # base-2 domain
            lse_ref[0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[1:])
        return

    m_prev = m_scr[:, 0]
    l_prev = l_scr[:, 0]
    m_cur = jnp.maximum(m_prev, s.max(axis=-1))
    alpha = e2(m_prev - m_cur)
    p = e2(s - m_cur[:, None])
    l_cur = l_prev * alpha + p.sum(axis=-1)
    acc_scr[...] = acc_scr[...] * alpha[:, None] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[...] = jnp.broadcast_to(m_cur[:, None], m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_cur[:, None], l_scr.shape)

    @pl.when(j == nk - 1)
    def _flush():
        o_ref[0] = (acc_scr[...] / l_scr[:, 0][:, None]).astype(o_ref.dtype)
        lse = m_scr[:, 0] + jnp.log2(l_scr[:, 0])     # base-2 domain
        lse_ref[0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[1:])


STREAM_BLOCK_Q = 256
STREAM_BLOCK_K = 512


def _flash_stream_forward(q, k, v):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = _pick_block(sq, STREAM_BLOCK_Q)
    block_k = _pick_block(sk, STREAM_BLOCK_K)
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    scale = float(d) ** -0.5
    nk = sk // block_k

    out, lse = pl.pallas_call(
        functools.partial(_fa_stream_kernel, nk=nk, scale=scale,
                          no_max=_fast_softmax(), poly_deg=_poly_exp()),
        grid=(b * h, sq // block_q, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LANE), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq, LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANE), jnp.float32),   # running max
            pltpu.VMEM((block_q, LANE), jnp.float32),   # running denom
            pltpu.VMEM((block_q, d), jnp.float32),      # accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf)
    return _unfold(out, b, h), lse


@jax.custom_vjp
def _flash_stream(q, k, v):
    return _flash_stream_forward(q, k, v)[0]


def _flash_stream_fwd(q, k, v):
    out, _ = _flash_stream_forward(q, k, v)
    return out, (q, k, v)


def _flash_stream_bwd(res, g):
    # streamed shapes (frozen VAE attention) never need gradients in
    # training; correctness fallback = differentiate the XLA reference
    q, k, v = res
    _, vjp = jax.vjp(_xla_reference, q, k, v)
    return vjp(g)


_flash_stream.defvjp(_flash_stream_fwd, _flash_stream_bwd)


def _stream_vmem_bytes(sq: int, sk: int, d: int, itemsize: int) -> int:
    bq = _pick_block(sq, STREAM_BLOCK_Q)
    bk = _pick_block(sk, STREAM_BLOCK_K)
    blocks = (bq * d + 2 * bk * d) * itemsize * 2   # q + k + v, dbl-buffered
    scratch = bq * d * 4 + 2 * bq * LANE * 4
    return blocks + scratch + bq * d * itemsize + bq * bk * 4


# VMEM budget for the kernel's working set. The full K and V for one
# (batch*head) live in VMEM and are double-buffered by the pipeline; leave
# headroom under the 16 MB scoped limit. 12 MB admits the measured-best
# bk=sk single-pass config at S=4096/d=64 (~10.9 MB estimated; runs clean
# on chip, BENCH_NOTES r5 block sweep) while longer sequences degrade bk
# via _pick_block_k instead of losing the resident kernel.
VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _vmem_bytes(sq: int, sk: int, d: int, itemsize: int) -> int:
    block_q = _pick_block(sq, env="STABLEMTL_FLASH_BLOCK_Q")
    if _mxu_lsum() and d < 128:
        # ones column appended to V: account V (and the accumulator) at
        # the lane-padded d+1 width the kernel actually tiles
        dv = -(-(d + 1) // 128) * 128
    else:
        dv = d
    kv = sk * (d + dv) * itemsize * 2       # K + V, double-buffered
    q_acc = block_q * d * itemsize + block_q * dv * 4  # q block + f32 acc
    p = block_q * _pick_block_k(sk, block_q, d, itemsize,
                                env="STABLEMTL_FLASH_BLOCK_K") * 4
    return kv + 2 * q_acc + p


def flash_attention(q, k, v, bias=None):
    """Fused attention [B,S,H,D] -> [B,Sq,H,D].

    Dispatch: resident-K/V kernel (fastest, Pallas fwd+bwd) when the
    working set fits VMEM; otherwise the K/V-streaming forward kernel
    (e.g. single-head d=512 VAE attention at seq 4096); XLA fallback only
    when a bias is present or no block-aligned tiling exists."""
    sq, sk, d = q.shape[1], k.shape[1], q.shape[-1]
    aligned = (d % 8 == 0 and _pick_block(sq) > 0 and _pick_block(sk) > 0)
    if bias is None and aligned:
        if _vmem_bytes(sq, sk, d, q.dtype.itemsize) <= VMEM_BUDGET_BYTES:
            return _flash(q, k, v)
        if _stream_vmem_bytes(sq, sk, d,
                              q.dtype.itemsize) <= VMEM_BUDGET_BYTES:
            return _flash_stream(q, k, v)
    from .attention import _xla_attention

    return _xla_attention(q, k, v, bias=bias)
