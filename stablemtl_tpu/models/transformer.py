"""Transformer blocks with first-class cross-task attention.

Rebuilds the semantics of reference src/model/attention.py (Transformer3DModel
/ BasicTransformerBlock / SparseCausalAttention + the per-task QKV surgery in
src/util/model.py:49-149) as a functional TPU-first design:

- Per-task K/V/Q projector parameters are *stacked banks* [n_tasks, ...]
  gathered with jnp.take — task identity is data, so one compiled graph
  serves every task (the reference instead mutates nn.ModuleDicts and relies
  on DDP find_unused_parameters).
- Cross-task attention keys are one token per auxiliary task per pixel
  (reference attention.py:500-515): queries [B,N,1,*], keys [B,N,T,*],
  n_attns=4 heads over the task axis, computed as dense einsums (MXU).
- The stochastic task-masking regularizer (attention.py:522-583) is drawn
  per layer from a flax RNG stream ('taskmask') with the 4 reference
  strategies, applied as an additive -inf bias under jnp.where.
- Feature taps are explicit return values (vs. the reference's
  `return_feature` attribute monkey-patching).
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from ..utils.env import env_flag
from .layers import FeedForward

NEG_INF = -1e9


def _taskattn_bmr() -> bool:
    """Trace-time switch: STABLEMTL_TASKATTN_BMR=1 computes the task-axis
    attention einsums as fused broadcast-mul-reduce instead of
    dot_general. The einsum form batches per-(pixel, head) matmuls of
    shape [1, d] x [d, T] with T=n_tasks=7 — the MXU pads every one of
    them to 128-cube tiles; the mul+reduce form does the identical math
    on the VPU with no padding, and keeping the scores/probs task-major
    ([T, B, N, h]) end-to-end avoids a [B,N,h,T]<->[T,B,N,h] transpose
    pair that costs more than the chain itself at stage 1. Measured on
    chip (tools/bench_microops.py taskchain; BENCH_NOTES r4): 1.47x at
    stage 0, 1.39x at stage 1 over the production einsums. Defaults to
    the STABLEMTL_FAST_MATH tier; STABLEMTL_TASKATTN_BMR=0/1 overrides
    either way. Same math, f32 mul instead of bf16-input MXU dot
    (slightly MORE precise); parity at the f32-association level
    (tests/test_models.py::test_taskattn_bmr_matches_einsum).
    """
    return env_flag("STABLEMTL_TASKATTN_BMR",
                    default=env_flag("STABLEMTL_FAST_MATH"))

TAP_POINTS = (
    "beforeSelfAttn",
    "afterSelfAttn_main", "afterSelfAttn_residual",
    "afterXAttn_main", "afterXAttn_residual",
    "afterFF_main", "afterFF_residual",
)


class _Kernel(nn.Module):
    """Bias-free Dense kernel holder: same param path/init as
    nn.Dense(use_bias=False) ({name}/kernel, lecun_normal) but returns the
    kernel itself so callers can fuse matmuls."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (in_features, self.features))


class Attention(nn.Module):
    """Multi-head attention (self or cross). Param names mirror diffusers
    (`to_q`/`to_k`/`to_v`/`to_out_0`) so checkpoint conversion is mechanical.

    Self-attention (context is None) computes Q,K,V as ONE fused
    [C, 3*inner] matmul — identical math per output column (each column
    contracts the same input row with the same kernel column), but x is
    read from HBM once instead of three times and the MXU sees one larger
    matmul. The params stay three separate kernels for checkpoint parity;
    the concat is bytes-cheap next to the matmul. Measured on-chip it is a
    wash vs three matmuls (4.491 vs 4.500 img/s full-step, round 3 —
    XLA already fuses the three) so the fused form is kept for the HBM
    argument; STABLEMTL_NO_FUSED_QKV=1 restores the split path."""

    heads: int
    dim_head: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        if context is None:
            C = x.shape[-1]
            wq = _Kernel(inner, name="to_q")(C)
            wk = _Kernel(inner, name="to_k")(C)
            wv = _Kernel(inner, name="to_v")(C)
            if os.environ.get("STABLEMTL_NO_FUSED_QKV"):  # A/B escape hatch
                q = x @ wq.astype(self.dtype)
                k = x @ wk.astype(self.dtype)
                v = x @ wv.astype(self.dtype)
            else:
                w = jnp.concatenate([wq, wk, wv], axis=-1).astype(self.dtype)
                qkv = x @ w
                q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_k")(context)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_v")(context)

        B, N, _ = q.shape
        L = k.shape[1]
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, L, self.heads, self.dim_head)
        v = v.reshape(B, L, self.heads, self.dim_head)
        out = dot_product_attention(q, k, v)
        out = out.reshape(B, N, inner)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out_0")(out)


def _bank(mod, name, shape, init):
    return mod.param(name, init, shape)


def _ln_bank(x, scale, bias, eps=1e-5):
    """LayerNorm over the last axis with externally-gathered scale/bias.

    x: [..., C]; scale/bias broadcastable to x.
    """
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _kv_project(p, feats, idx, nm, dtype, fast_gelu: bool = False):
    """K or V task projection LN_t -> MLP(C -> C/2 -> C) from raw bank
    params `p` (a TaskAttentionBank param dict), for tasks `idx` ([T] int
    or None = all), applied to feats [T, B, N, C]. Pure function so the
    fused multi-task inference can build the K/V tables ONCE for all
    tasks outside the per-stream vmap (they depend only on the shared
    child features, not on the main stream)."""
    def g(x):
        return x if idx is None else jnp.take(x, idx, axis=0)

    s = g(p[f"task_norm_{nm}_scale"])[:, None, None, :]
    b = g(p[f"task_norm_{nm}_bias"])[:, None, None, :]
    x = _ln_bank(feats, s, b)
    w1 = g(p[f"task_to_{nm}_fc1_kernel"]).astype(dtype)
    b1 = g(p[f"task_to_{nm}_fc1_bias"]).astype(dtype)
    w2 = g(p[f"task_to_{nm}_fc2_kernel"]).astype(dtype)
    b2 = g(p[f"task_to_{nm}_fc2_bias"]).astype(dtype)
    x = jnp.einsum("tbnc,tcd->tbnd", x, w1,
                   preferred_element_type=jnp.float32).astype(dtype)
    x = nn.gelu(x + b1[:, None, None, :], approximate=fast_gelu)
    x = jnp.einsum("tbnc,tcd->tbnd", x, w2,
                   preferred_element_type=jnp.float32).astype(dtype)
    return x + b2[:, None, None, :]


class TaskAttentionBank(nn.Module):
    """Cross-task attention for one UNet attention layer.

    Owns stacked per-task parameter banks over ALL n_tasks; callers pass
    `aux_idx` (the auxiliary tasks whose features form the key set, shape
    [T_aux]) and `main_idx` (scalar, selects the query projector).
    """

    dim: int
    n_tasks: int
    n_attns: int = 4           # heads over the task axis (train_stablemtl.yaml:23)
    q_hidden: int = 640        # MLPv2 hidden (util/model.py:126-132)
    q_hidden_layers: int = 2
    attn_mask_ratio: float = 0.0
    attn_mask_type: str = "attn_prob"
    dtype: jnp.dtype = jnp.float32
    fast_math: bool = False    # tanh-approx gelu in the K/V/Q MLPs

    @nn.compact
    def __call__(self, hidden, task_feats, main_idx, aux_idx,
                 train: bool = False, task_kv=None, task_key_bias=None):
        """
        hidden: [B, N, C] main-stream features (after self-attn projection).
        task_feats: [T_aux, B, N, C] child features per auxiliary task
            (may be None when task_kv is given).
        main_idx: scalar int — index of the main task in the canonical order.
        aux_idx: [T_aux] int — indices of the auxiliary tasks.
        task_kv: optional (k_all, v_all) [n_tasks, B, N, C] precomputed over
            ALL tasks (task_kv_tables). The bank then attends over the FULL
            task axis with `task_key_bias` ([n_tasks], -inf on excluded
            tasks) — exactly equal to attending over the gathered aux
            subset (exp(-1e9)=0 in f32), but the big K/V tensors stay
            SHARED across the vmapped main streams instead of being
            re-gathered (or worse, re-projected) per stream.
        Returns [B, N, C] to be added to `hidden`.
        """
        C, T = self.dim, self.n_tasks
        Ch = C // 2
        lecun = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones

        def dense_bank(name, din, dout):
            w = _bank(self, f"{name}_kernel", (T, din, dout), lecun)
            b = _bank(self, f"{name}_bias", (T, dout), zeros)
            return w, b

        # ---- K/V projectors: LN_t -> MLP(C -> C/2 -> C) per task ----------
        outs = {}
        if task_kv is not None:
            outs["k"] = task_kv[0].astype(self.dtype)
            outs["v"] = task_kv[1].astype(self.dtype)
        for nm in ("k", "v"):
            ln_s = _bank(self, f"task_norm_{nm}_scale", (T, C), ones)
            ln_b = _bank(self, f"task_norm_{nm}_bias", (T, C), zeros)
            w1, b1 = dense_bank(f"task_to_{nm}_fc1", C, Ch)
            w2, b2 = dense_bank(f"task_to_{nm}_fc2", Ch, C)
            if task_kv is None:
                p = {f"task_norm_{nm}_scale": ln_s,
                     f"task_norm_{nm}_bias": ln_b,
                     f"task_to_{nm}_fc1_kernel": w1,
                     f"task_to_{nm}_fc1_bias": b1,
                     f"task_to_{nm}_fc2_kernel": w2,
                     f"task_to_{nm}_fc2_bias": b2}
                outs[nm] = _kv_project(p, task_feats, aux_idx, nm, self.dtype,
                                       fast_gelu=self.fast_math)

        # ---- Q projector: LN_m -> MLPv2(C -> 640 x3 -> C) for main task ---
        q_ln_s = _bank(self, "task_norm_q_scale", (T, C), ones)
        q_ln_b = _bank(self, "task_norm_q_bias", (T, C), zeros)
        q = _ln_bank(hidden,
                     jnp.take(q_ln_s, main_idx, axis=0),
                     jnp.take(q_ln_b, main_idx, axis=0))
        dims = [C] + [self.q_hidden] * (self.q_hidden_layers + 1) + [C]
        for li in range(len(dims) - 1):
            w, b = dense_bank(f"task_to_q_net_{2 * li}", dims[li], dims[li + 1])
            wg = jnp.take(w, main_idx, axis=0).astype(self.dtype)
            bg = jnp.take(b, main_idx, axis=0).astype(self.dtype)
            q = jnp.einsum("bnc,cd->bnd", q, wg,
                           preferred_element_type=jnp.float32).astype(self.dtype) + bg
            if li < len(dims) - 2:
                q = nn.gelu(q, approximate=self.fast_math)

        # ---- attention over the task axis (per pixel) ---------------------
        B, N, _ = q.shape
        T_aux = outs["k"].shape[0]
        h, d = self.n_attns, C // self.n_attns
        qh = q.reshape(B, N, h, d)
        kh = outs["k"].reshape(T_aux, B, N, h, d)
        vh = outs["v"].reshape(T_aux, B, N, h, d)

        scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
        bmr = _taskattn_bmr()
        if bmr:
            # Fused broadcast-mul-reduce, task-major: scores stay
            # [T_aux, B, N, h] all the way through the softmax (see
            # _taskattn_bmr for the measured rationale — the dot_general
            # form pads 1xdxT matmuls to 128-cube MXU tiles, and a
            # restore-the-layout transpose pair costs more than the
            # whole chain at stage 1).
            scores = (qh[None].astype(jnp.float32)
                      * kh.astype(jnp.float32)).sum(-1) * scale
        else:
            scores = jnp.einsum("bnhd,tbnhd->bnht", qh, kh,
                                preferred_element_type=jnp.float32) * scale

        def add_key_bias(scores, b):
            # b: [T_aux] f32 — broadcast over (B, N, h) in either layout
            return scores + (b[:, None, None, None] if bmr else b)

        if task_key_bias is not None:
            scores = add_key_bias(scores, task_key_bias)

        # In the task_kv path the key axis is ALL n_tasks with excluded
        # tasks -inf-biased, not the gathered T_aux subset: tell the mask
        # sampler which keys are real so 'random'/'random_k' never target
        # (or count) already-excluded keys.
        key_valid = (None if task_key_bias is None
                     else task_key_bias > NEG_INF / 2)
        bias = self._mask_bias(scores, T_aux, train, key_valid=key_valid,
                               t_major=bmr)
        if bias is not None:
            scores = add_key_bias(scores, bias)

        if bmr:
            probs = jax.nn.softmax(scores, axis=0).astype(self.dtype)
            out = (probs[..., None] * vh).sum(0)
        else:
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            out = jnp.einsum("bnht,tbnhd->bnhd", probs, vh,
                             preferred_element_type=jnp.float32) \
                .astype(self.dtype)
        out = out.reshape(B, N, C)

        # zero-initialized output projection: module starts as identity
        # (util/model.py:140-146)
        w_out = self.param("to_out_task_kernel", zeros, (C, C))
        b_out = self.param("to_out_task_bias", zeros, (C,))
        return out @ w_out.astype(self.dtype) + b_out.astype(self.dtype)

    def _mask_bias(self, scores, T_aux: int, train: bool, key_valid=None,
                   t_major: bool = False):
        """Stochastic task-masking regularizer (attention.py:522-583).

        With prob attn_mask_ratio, pick task(s) from the mean attention
        distribution (strategy-dependent) and bias their keys to -inf;
        returns a flat [T_aux] bias (the caller orients the broadcast).
        key_valid ([T] bool or None): which keys are real — in the task_kv
        layout the axis spans ALL tasks and the main task is already
        -inf-excluded; without this, 'random' could waste its pick on the
        excluded key (silently lowering the effective mask ratio) and
        'attn_prob_random_k' could mask ALL real keys.
        t_major: scores are [T_aux, B, N, h] (the bmr layout) instead of
        [B, N, h, T_aux]; the softmax/mean axes swap accordingly.
        """
        if not train or self.attn_mask_ratio <= 0.0 or T_aux <= 1:
            return None
        key = self.make_rng("taskmask")
        k_gate, k_pick, k_k = jax.random.split(key, 3)
        do_mask = jax.random.bernoulli(k_gate, self.attn_mask_ratio)

        # excluded keys already carry -inf in `scores`, so their mean prob
        # is ~0 and 'attn_prob'/'highest' avoid them by construction
        if t_major:
            mean_probs = jax.lax.stop_gradient(
                jax.nn.softmax(scores, axis=0).mean(axis=(1, 2, 3)))
        else:
            mean_probs = jax.lax.stop_gradient(
                jax.nn.softmax(scores, axis=-1).mean(axis=(0, 1, 2)))  # [T_aux]

        if self.attn_mask_type == "attn_prob":
            idx = jax.random.categorical(k_pick, jnp.log(mean_probs + 1e-20))
            mask = jax.nn.one_hot(idx, T_aux, dtype=jnp.float32)
        elif self.attn_mask_type == "random":
            if key_valid is None:
                idx = jax.random.randint(k_pick, (), 0, T_aux)
            else:  # uniform over the REAL keys only
                idx = jax.random.categorical(
                    k_pick, jnp.where(key_valid, 0.0, NEG_INF))
            mask = jax.nn.one_hot(idx, T_aux, dtype=jnp.float32)
        elif self.attn_mask_type == "highest":
            mask = jax.nn.one_hot(jnp.argmax(mean_probs), T_aux,
                                  dtype=jnp.float32)
        elif self.attn_mask_type == "attn_prob_random_k":
            # multinomial without replacement == Gumbel top-k
            n_real = (jnp.asarray(T_aux) if key_valid is None
                      else key_valid.sum())
            n_mask = jax.random.randint(k_k, (), 1,
                                        jnp.maximum(n_real, 2))
            g = jnp.log(mean_probs + 1e-20) - jnp.log(
                -jnp.log(jax.random.uniform(k_pick, (T_aux,)) + 1e-20) + 1e-20)
            if key_valid is not None:
                g = jnp.where(key_valid, g, -jnp.inf)
            rank = jnp.argsort(jnp.argsort(-g))
            mask = (rank < n_mask).astype(jnp.float32)
        else:
            raise ValueError(f"Invalid attn_mask_type: {self.attn_mask_type}")

        return jnp.where(do_mask, mask * NEG_INF, 0.0)  # flat [T_aux]


class BasicTransformerBlock(nn.Module):
    """self-attn (+cross-task) -> text cross-attn -> GEGLU FF, pre-LN.

    Parity with reference attention.py:226-380; the cross-task module is
    injected after the self-attention output projection and before the
    residual add (attention.py:460-600).
    """

    dim: int
    heads: int
    dim_head: int
    n_tasks: int = 0
    use_task_attention: bool = False
    n_attns: int = 4
    attn_mask_ratio: float = 0.0
    attn_mask_type: str = "attn_prob"
    dtype: jnp.dtype = jnp.float32
    # bf16 fast path: LayerNorm outputs in compute dtype (statistics stay
    # f32 inside flax) + tanh-approx gelu. Default off for bit-parity.
    fast_math: bool = False

    @nn.compact
    def __call__(self, x, context, task_feats=None, main_idx=None,
                 aux_idx=None, tap: Optional[str] = None, train: bool = False,
                 task_kv=None, task_key_bias=None,
                 front_only: bool = False, front_state=None):
        """front_only/front_state split the block at the end of self-attn:
        everything before (norm1 + attn1) is independent of the text/task
        conditioning, so the fused multi-task pipeline computes it ONCE
        per distinct input and resumes the per-task remainder from the
        saved `attn1` output (see UNet2DConditionModel prefix sharing).
        front_only=True returns just that attn1 output; front_state is
        that output (batched to this call's batch) and skips norm1/attn1.
        """
        tap_feat = None
        ndt = self.dtype if self.fast_math else jnp.float32
        if tap == "beforeSelfAttn":
            tap_feat = x

        if front_state is None:
            h = nn.LayerNorm(dtype=ndt, name="norm1")(x).astype(self.dtype)
            attn_out = Attention(self.heads, self.dim_head, self.dim,
                                 dtype=self.dtype, name="attn1")(h)
            if front_only:
                return attn_out
        else:
            attn_out = front_state
        if self.use_task_attention and (task_feats is not None
                                        or task_kv is not None):
            attn_out = attn_out + TaskAttentionBank(
                dim=self.dim, n_tasks=self.n_tasks, n_attns=self.n_attns,
                attn_mask_ratio=self.attn_mask_ratio,
                attn_mask_type=self.attn_mask_type,
                dtype=self.dtype, fast_math=self.fast_math, name="task_attn",
            )(attn_out, task_feats, main_idx, aux_idx, train=train,
              task_kv=task_kv, task_key_bias=task_key_bias)
        x = x + attn_out
        if tap == "afterSelfAttn_residual":
            tap_feat = attn_out
        elif tap == "afterSelfAttn_main":
            tap_feat = x

        h = nn.LayerNorm(dtype=ndt, name="norm2")(x).astype(self.dtype)
        xattn_out = Attention(self.heads, self.dim_head, self.dim,
                              dtype=self.dtype, name="attn2")(h, context)
        x = x + xattn_out
        if tap == "afterXAttn_residual":
            tap_feat = xattn_out
        elif tap == "afterXAttn_main":
            tap_feat = x

        h = nn.LayerNorm(dtype=ndt, name="norm3")(x).astype(self.dtype)
        ff_out = FeedForward(self.dim, dtype=self.dtype,
                             fast_gelu=self.fast_math, name="ff")(h)
        x = x + ff_out
        if tap == "afterFF_residual":
            tap_feat = ff_out
        elif tap == "afterFF_main":
            tap_feat = x

        return x, tap_feat


class Transformer2D(nn.Module):
    """GroupNorm -> linear proj_in -> 1 transformer block -> proj_out + residual.

    SD2 uses use_linear_projection=True; parity with reference
    attention.py:114-223 minus the (b f) folds.
    """

    heads: int
    dim_head: int
    n_tasks: int = 0
    use_task_attention: bool = False
    n_attns: int = 4
    attn_mask_ratio: float = 0.0
    attn_mask_type: str = "attn_prob"
    norm_groups: int = 32  # diffusers threads the UNet's norm_num_groups here
    dtype: jnp.dtype = jnp.float32
    fast_math: bool = False

    @nn.compact
    def __call__(self, x, context, task_feats=None, main_idx=None,
                 aux_idx=None, tap: Optional[str] = None, train: bool = False,
                 task_kv=None, task_key_bias=None,
                 front_only: bool = False, front_state=None):
        """front_only: run GroupNorm + proj_in + the block's norm1/attn1
        (everything before any conditioning) and return (h_proj, attn1) —
        the state the fused pipeline shares across task streams.
        front_state: that pair, batched to x's batch; x must still be the
        layer input (it is the residual and the block's residual stream).
        """
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        residual = x
        ndt = self.dtype if self.fast_math else jnp.float32
        block = BasicTransformerBlock(
            dim=inner, heads=self.heads, dim_head=self.dim_head,
            n_tasks=self.n_tasks, use_task_attention=self.use_task_attention,
            n_attns=self.n_attns, attn_mask_ratio=self.attn_mask_ratio,
            attn_mask_type=self.attn_mask_type, dtype=self.dtype,
            fast_math=self.fast_math,
            name="transformer_blocks_0",
        )
        if front_state is None:
            h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, dtype=ndt,
                             name="norm")(x)
            h = h.reshape(B, H * W, C).astype(self.dtype)
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
            if front_only:
                return h, block(h, context, front_only=True)
            attn1 = None
        else:
            h, attn1 = front_state
        h, tap_feat = block(
            h, context, task_feats, main_idx, aux_idx, tap=tap, train=train,
            task_kv=task_kv, task_key_bias=task_key_bias, front_state=attn1)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(B, H, W, C) + residual, tap_feat
