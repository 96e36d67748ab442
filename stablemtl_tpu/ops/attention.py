"""Fused scaled-dot-product attention dispatch.

Replaces the reference's xformers.ops.memory_efficient_attention
(/root/reference/src/model/attention.py:395,587). On TPU the default path is
XLA's fused attention via jax.nn.dot_product_attention; a Pallas flash
kernel (ops/flash_attention.py) is used for long self-attention sequences
where it wins on HBM traffic.

All shapes are [batch, seq, heads, head_dim] (BSHD), bias broadcastable to
[batch, heads, q_seq, kv_seq].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Pallas flash attention threshold: below this sequence length the plain XLA
# softmax-attention is faster (kernel launch + pipeline overheads dominate).
FLASH_MIN_SEQ = 1024


def _xla_attention(q, k, v, bias=None):
    """Reference einsum attention; robust for any (small) shape."""
    dtype = q.dtype
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def dot_product_attention(q, k, v, bias=None, use_flash: bool | None = None):
    """Fused attention. q,k,v: [B, S, H, D]. Returns [B, Sq, H, D].

    use_flash: force (True) / forbid (False) the Pallas kernel; None = auto.
    """
    seq_q = q.shape[1]
    if use_flash is None:
        from ..utils.env import env_flag

        use_flash = (
            seq_q >= FLASH_MIN_SEQ
            and q.shape[1] == k.shape[1]
            and jax.default_backend() == "tpu"
            and not env_flag("STABLEMTL_DISABLE_FLASH")
        )
    if use_flash:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias)
    try:
        return jax.nn.dot_product_attention(q, k, v, bias=bias)
    except (TypeError, ValueError, NotImplementedError):
        # only configuration rejections (unsupported head dim/bias rank on
        # this backend) fall back to the [S,S]-materializing einsum; a
        # bare except would silently absorb genuine caller bugs into a
        # much slower, memory-hungry path
        return _xla_attention(q, k, v, bias=bias)
