"""Pallas TPU flash attention (forward kernel, online softmax).

Replaces xformers.ops.memory_efficient_attention of the reference
(src/model/attention.py:395,587) for long self-attention sequences
(latent 64x64 -> 4096 tokens at 512x512 inputs). The kernel never
materializes the [S, S] logits matrix: per (batch*head, q-block) grid cell
it streams K/V blocks from VMEM and maintains the running max / normalizer
/ accumulator of the online-softmax recurrence.

Backward: jax.custom_vjp whose bwd re-runs the XLA einsum attention under
jax.vjp — flash memory/speed in the forward (the inference hot path), exact
gradients in training. A Pallas backward is a future optimization.

Shapes are BSHD [batch, seq, heads, head_dim]; head_dim should be a
multiple of 8 (64 for SD2). Falls back to XLA attention when a bias is
given or the sequence has no block-aligned tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_BLOCK = 512
NEG_INF = -1e30


def _pick_block(s: int, max_block: int = MAX_BLOCK) -> int:
    """Largest divisor of s that is <= max_block and a multiple of 8."""
    best = 0
    for b in range(8, min(max_block, s) + 1, 8):
        if s % b == 0:
            best = b
    return best


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale          # [Bq, D]
    bq, d = q.shape
    s_len = k_ref.shape[1]
    nk = s_len // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [Bq, Bk]
        m_cur = jnp.maximum(m_prev, s.max(axis=-1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + p.sum(axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_cur, l_cur, acc

    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


def _flash_forward(q, k, v):
    """q,k,v: [B, S, H, D] (kv seq may differ from q seq)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = _pick_block(sq)
    block_k = _pick_block(sk)

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)

    scale = float(d) ** -0.5
    kernel = functools.partial(_fa_kernel, block_k=block_k, scale=scale)
    grid = (b * h, sq // block_q)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _xla_reference(q, k, v):
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@jax.custom_vjp
def _flash(q, k, v):
    return _flash_forward(q, k, v)


def _flash_fwd(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _flash_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_reference, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


# VMEM budget for the kernel's working set. The full K and V for one
# (batch*head) live in VMEM and are double-buffered by the pipeline; leave
# headroom under the 16 MB scoped limit.
VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _vmem_bytes(sq: int, sk: int, d: int, itemsize: int) -> int:
    block_q = _pick_block(sq)
    kv = 2 * sk * d * itemsize * 2          # K + V, double-buffered
    q_acc = block_q * d * (itemsize + 4)    # q block + f32 accumulator
    p = block_q * _pick_block(sk) * 4       # score block
    return kv + 2 * q_acc + p


def flash_attention(q, k, v, bias=None):
    """Fused attention [B,S,H,D] -> [B,Sq,H,D]; XLA fallback when the shape
    has no aligned tiling, a bias is present, or the working set exceeds
    the VMEM budget (e.g. single-head d=512 VAE attention at long seq)."""
    sq, sk, d = q.shape[1], k.shape[1], q.shape[-1]
    if (bias is not None or d % 8 != 0 or _pick_block(sq) == 0
            or _pick_block(sk) == 0
            or _vmem_bytes(sq, sk, d, q.dtype.itemsize)
            > VMEM_BUDGET_BYTES):
        from .attention import _xla_attention

        return _xla_attention(q, k, v, bias=bias)
    return _flash(q, k, v)
