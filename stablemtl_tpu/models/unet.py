"""Conditional UNet (SD2 layout) with functional task-feature taps.

TPU-first rebuild of reference src/model/unet.py + unet_blocks.py: a clean 2D
NHWC UNet — the reference's pseudo-3D "(b f)" machinery and the mutable
`task_feat_idx` counter threading (unet_blocks.py:206,321,530) are replaced by
plain 2D convs (tasks folded into batch by the caller) and explicit
(sample, taps) outputs.

SD2 geometry (from the SD2 unet config the reference loads at runtime):
block channels (320, 640, 1280, 1280), 2 layers/block, cross-attn dim 1024,
heads (5, 10, 20, 20) with head_dim 64, linear transformer projections,
16 attention layers in order: down0 x2, down1 x2, down2 x2, mid, up1 x3,
up2 x3, up3 x3 (layer dims match reference util/model.py:67-84).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (
    Downsample,
    ResnetBlock,
    TimestepEmbedding,
    Upsample,
    timestep_embedding,
)
from .transformer import Transformer2D


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 12           # rgb(4) | rgb_next(4) | noise(4)
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    norm_groups: int = 32
    norm_eps: float = 1e-5
    # cross-task attention (multi-stream main UNet only)
    n_tasks: int = 7
    use_task_attention: bool = False
    task_attn_layers: str = "all"   # "all" (16 layers) | "dec" (layers 7..15)
    n_attns: int = 4
    attn_mask_ratio: float = 0.0
    attn_mask_type: str = "attn_prob"
    # compute
    dtype: str = "float32"
    remat: bool = False
    # transformer-layer rematerialization policy for training memory:
    # "none" (save all activations), "full" (recompute the whole layer in
    # the backward), "dots" (jax.checkpoint_policies.dots_saveable — keep
    # every matmul output, recompute only elementwise norms/gelus/softmax).
    # Resnet remat stays governed by `remat` (full-block). Measured A/B:
    # tools/bench_train512.py remat mode; BENCH_NOTES r5.
    remat_transformer: str = "none"
    # bf16 fast path: norms emit compute dtype (statistics stay f32) and
    # gelu uses the tanh approximation (error < bf16 rounding). Off by
    # default — parity tests and f32 training are bit-identical to the
    # reference semantics; inference presets enable it (measured on v5e,
    # BENCH_NOTES.md round 3).
    fast_math: bool = False

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def num_attn_layers(self) -> int:
        """Total transformer layers: every down block but the last has
        layers_per_block, mid has 1, every up block but the first has
        layers_per_block+1 (16 for the SD2 layout, reference
        util/model.py:67-84)."""
        n_attn_blocks = len(self.block_out_channels) - 1
        return (self.layers_per_block * n_attn_blocks + 1
                + (self.layers_per_block + 1) * n_attn_blocks)

    def task_attn_layer_set(self) -> frozenset:
        n_down = self.layers_per_block * (len(self.block_out_channels) - 1)
        if self.task_attn_layers == "all":
            return frozenset(range(self.num_attn_layers))
        if self.task_attn_layers == "dec":
            # decoder-only: everything after the mid layer (index n_down)
            return frozenset(range(n_down + 1, self.num_attn_layers))
        raise ValueError(self.task_attn_layers)


def tiny_unet_config(**kw) -> UNetConfig:
    """Small config for tests/drives (same topology, tiny widths)."""
    base = dict(
        block_out_channels=(32, 64, 64, 64),
        attention_heads=(2, 2, 2, 2),
        cross_attention_dim=32,
        norm_groups=8,
    )
    base.update(kw)
    return UNetConfig(**base)


class UNet2DConditionModel(nn.Module):
    config: UNetConfig

    def _transformer(self, layer_idx: int, heads: int, dim_head: int, name: str):
        cfg = self.config
        use_task = (cfg.use_task_attention
                    and layer_idx in cfg.task_attn_layer_set())
        return Transformer2D(
            heads=heads, dim_head=dim_head,
            n_tasks=cfg.n_tasks, use_task_attention=use_task,
            n_attns=cfg.n_attns, attn_mask_ratio=cfg.attn_mask_ratio,
            attn_mask_type=cfg.attn_mask_type,
            norm_groups=cfg.norm_groups, dtype=cfg.jnp_dtype,
            fast_math=cfg.fast_math, name=name,
        )

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 task_feats: Optional[Sequence] = None,
                 main_idx=None, aux_idx=None,
                 tap: Optional[str] = None, train: bool = False,
                 task_kv: Optional[Sequence] = None, task_key_bias=None,
                 prefix_only: bool = False, prefix_state=None):
        """
        sample: [B, H, W, C_in]; timesteps: [B] (or scalar); context [B, L, D].
        task_feats: list of 16 arrays [T_aux, B, N_l, C_l] from the child UNet.
        task_kv: optional list of 16 (k_all, v_all)/None pairs from
            `task_kv_tables` — precomputed all-task K/V shared by every
            main stream (fused inference fast path); task_key_bias
            ([n_tasks], -inf on excluded tasks) masks the key set per
            stream instead of gathering it.
        prefix_only: run only the conditioning-independent prefix —
            conv_in, down_blocks_0_resnets_0, and the first transformer
            layer up to its self-attn output (the text/task conditioning
            first enters at that layer's cross/task attention) — and
            return a state dict. The fused multi-task pipeline computes
            this once per DISTINCT input instead of once per task stream.
        prefix_state: that dict, with leaves tiled to the full stream
            batch; `sample` may be None (only conv_in consumes it) and the
            forward resumes after the first self-attn.
        Returns (out [B, H, W, C_out], taps: list of 16 arrays or Nones).
        """
        cfg = self.config
        dtype = cfg.jnp_dtype
        ch = cfg.block_out_channels
        n_blocks = len(ch)
        head_dim = [ch[i] // cfg.attention_heads[i] for i in range(n_blocks)]

        if (prefix_only or prefix_state is not None) and (
                n_blocks < 2 or cfg.layers_per_block < 1):
            # backstop: pipeline._prefix_share_ok checks the same topology
            # and falls back to the plain path instead of reaching here
            raise ValueError(
                "prefix sharing needs an attention layer in down block 0 "
                "(n_blocks >= 2 and layers_per_block >= 1)")
        batch = (sample.shape[0] if prefix_state is None
                 else prefix_state["res"].shape[0])
        timesteps = jnp.atleast_1d(jnp.asarray(timesteps))
        timesteps = jnp.broadcast_to(timesteps, (batch,))
        t_emb = timestep_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, dtype=dtype,
                                 name="time_embedding")(t_emb)

        if prefix_state is None:
            sample = sample.astype(dtype)
        encoder_hidden_states = encoder_hidden_states.astype(dtype)

        taps = []
        attn_layer = 0

        def run_transformer(h, name, heads, dhead, front_state=None):
            nonlocal attn_layer
            tf = self._transformer(attn_layer, heads, dhead, name)
            feats = kv = None
            if (cfg.use_task_attention
                    and attn_layer in cfg.task_attn_layer_set()):
                if task_feats is not None:
                    feats = task_feats[attn_layer]
                if task_kv is not None:
                    kv = task_kv[attn_layer]
            if cfg.remat_transformer == "none":
                h, tap_feat = tf(h, encoder_hidden_states, feats, main_idx,
                                 aux_idx, tap=tap, train=train, task_kv=kv,
                                 task_key_bias=task_key_bias,
                                 front_state=front_state)
            else:
                # remat the layer body; tap/train are static via closure so
                # the lifted transform sees only array (pytree) arguments.
                # "dots": keep matmul outputs, recompute the elementwise
                # chains; "full": recompute the whole layer in the backward.
                policy = (jax.checkpoint_policies.dots_saveable
                          if cfg.remat_transformer == "dots" else None)

                def tf_body(mdl, h, ctx, feats, kv, key_bias, fs):
                    return mdl(h, ctx, feats, main_idx, aux_idx, tap=tap,
                               train=train, task_kv=kv, task_key_bias=key_bias,
                               front_state=fs)

                h, tap_feat = nn.remat(tf_body, policy=policy)(
                    tf, h, encoder_hidden_states, feats, kv,
                    task_key_bias, front_state)
            taps.append(tap_feat)
            attn_layer += 1
            return h

        ndt = dtype if cfg.fast_math else jnp.float32
        resblock = partial(ResnetBlock, groups=cfg.norm_groups,
                           eps=cfg.norm_eps, dtype=dtype, norm_dtype=ndt)
        if cfg.remat:
            resblock = partial(nn.remat(ResnetBlock), groups=cfg.norm_groups,
                               eps=cfg.norm_eps, dtype=dtype, norm_dtype=ndt)

        # ---- in ------------------------------------------------------------
        if prefix_state is None:
            h = nn.Conv(ch[0], (3, 3), padding=((1, 1), (1, 1)), dtype=dtype,
                        name="conv_in")(sample)
        else:
            h = prefix_state["conv"]

        # ---- down ----------------------------------------------------------
        res_samples = [h]
        for i in range(n_blocks):
            is_final = i == n_blocks - 1
            has_attn = not is_final  # last block is attention-free (DownBlock)
            for j in range(cfg.layers_per_block):
                first = i == 0 and j == 0
                if first and prefix_state is not None:
                    # resume after the shared prefix: the first resnet and
                    # the first layer's norm1/attn1 were computed once by a
                    # prefix_only call and tiled by the caller
                    h = run_transformer(
                        prefix_state["res"], "down_blocks_0_attentions_0",
                        cfg.attention_heads[0], head_dim[0],
                        front_state=prefix_state["front"])
                    res_samples.append(h)
                    continue
                h = resblock(out_channels=ch[i],
                             name=f"down_blocks_{i}_resnets_{j}")(h, temb)
                if first and prefix_only:
                    tf = self._transformer(0, cfg.attention_heads[0],
                                           head_dim[0],
                                           "down_blocks_0_attentions_0")
                    front = tf(h, encoder_hidden_states, front_only=True)
                    return {"conv": res_samples[0], "res": h, "front": front}
                if has_attn:
                    h = run_transformer(
                        h, f"down_blocks_{i}_attentions_{j}",
                        cfg.attention_heads[i], head_dim[i])
                res_samples.append(h)
            if not is_final:
                h = Downsample(ch[i], dtype=dtype,
                               name=f"down_blocks_{i}_downsamplers_0")(h)
                res_samples.append(h)

        # ---- mid -----------------------------------------------------------
        h = resblock(out_channels=ch[-1], name="mid_block_resnets_0")(h, temb)
        h = run_transformer(h, "mid_block_attentions_0",
                            cfg.attention_heads[-1], head_dim[-1])
        h = resblock(out_channels=ch[-1], name="mid_block_resnets_1")(h, temb)

        # ---- up ------------------------------------------------------------
        rev_ch = list(reversed(ch))
        rev_heads = list(reversed(cfg.attention_heads))
        rev_hdim = list(reversed(head_dim))
        for i in range(n_blocks):
            is_final = i == n_blocks - 1
            has_attn = i > 0  # first up block (from mid) is attention-free
            out_ch = rev_ch[i]
            n_layers = cfg.layers_per_block + 1
            skips = res_samples[-n_layers:]
            res_samples = res_samples[:-n_layers]
            for j in range(n_layers):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = resblock(out_channels=out_ch,
                             name=f"up_blocks_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    h = run_transformer(
                        h, f"up_blocks_{i}_attentions_{j}",
                        rev_heads[i], rev_hdim[i])
            if not is_final:
                # upsample to the spatial size of the next skip connection
                target_hw = res_samples[-1].shape[1:3]
                out_size = None if target_hw == (h.shape[1] * 2, h.shape[2] * 2) \
                    else target_hw
                h = Upsample(out_ch, dtype=dtype,
                             name=f"up_blocks_{i}_upsamplers_0")(h, out_size)

        # ---- out -----------------------------------------------------------
        h = nn.GroupNorm(cfg.norm_groups, epsilon=cfg.norm_eps,
                         dtype=ndt, name="conv_norm_out")(h)
        h = nn.silu(h).astype(dtype)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dtype, name="conv_out")(h)
        return h, taps


def task_feat_shapes(config: UNetConfig, height: int, width: int):
    """(tokens, channels) of each of the 16 attention-layer feature taps.

    Layer order: down0 x2, down1 x2, down2 x2, mid, up1 x3, up2 x3, up3 x3
    (matches reference util/model.py:67-84 layer_dims / attn_to_idx).
    """
    ch = config.block_out_channels
    heads = config.attention_heads
    inner = [ch[i] // heads[i] * heads[i] for i in range(len(ch))]
    # each Downsample is a pad-(1,1) stride-2 conv -> ceil(x/2) per level
    # (a >> would floor and report wrong token counts for odd sizes)
    res, h, w = [], height, width
    for _ in range(4):
        res.append(h * w)
        h, w = -(-h // 2), -(-w // 2)
    shapes = []
    for i in range(3):                       # down blocks 0..2
        shapes += [(res[i], inner[i])] * config.layers_per_block
    shapes += [(res[3], inner[3])]           # mid
    for i in (2, 1, 0):                      # up blocks 1..3 (attn ones)
        shapes += [(res[i], inner[i])] * (config.layers_per_block + 1)
    return shapes


def attention_layer_names(config: UNetConfig):
    """Module names of the 16 attention layers in traversal order (matches
    `__call__`'s run_transformer sequence and the task_feats list order)."""
    n_blocks = len(config.block_out_channels)
    names = []
    for i in range(n_blocks - 1):
        names += [f"down_blocks_{i}_attentions_{j}"
                  for j in range(config.layers_per_block)]
    names.append("mid_block_attentions_0")
    for i in range(1, n_blocks):
        names += [f"up_blocks_{i}_attentions_{j}"
                  for j in range(config.layers_per_block + 1)]
    return names


def task_kv_tables(config: UNetConfig, unet_params, taps_all):
    """Precompute the cross-task K/V tables for ALL tasks, once per layer.

    The K/V projectors are functions of the SHARED child features only
    (reference attention.py:500-515: keys/values come from the auxiliary
    streams' features), so in fused multi-task inference they are identical
    for every main stream — computing them inside the per-stream vmap
    re-ran the MLPs n_tasks times. Returns a list over the 16 attention
    layers of (k_all, v_all) ([n_tasks, B, N, C]) or None for layers
    without task attention; pass as `UNet2DConditionModel.__call__`'s
    `task_kv`.

    taps_all: list of 16 [n_tasks, B, N_l, C_l] (child_taps_all_tasks).
    """
    from .transformer import _kv_project

    p = unet_params.get("params", unet_params)
    active = config.task_attn_layer_set()
    dtype = config.jnp_dtype
    tables = []
    for li, name in enumerate(attention_layer_names(config)):
        if li not in active:
            tables.append(None)
            continue
        bank = p[name]["transformer_blocks_0"]["task_attn"]
        k = _kv_project(bank, taps_all[li], None, "k", dtype,
                        fast_gelu=config.fast_math)
        v = _kv_project(bank, taps_all[li], None, "v", dtype,
                        fast_gelu=config.fast_math)
        tables.append((k, v))
    return tables


def inflate_conv_in(params_conv_in: dict, repeat: int = 3) -> dict:
    """4->4*repeat channel inflation of conv_in, repeat/scale init rule.

    Parity with reference src/util/model.py:11-27: weights repeated along the
    input-channel axis and scaled by 1/repeat so the inflated conv initially
    computes the same output for duplicated inputs. NHWC kernels are
    [kh, kw, C_in, C_out]; torch repeats along C_in.
    """
    kernel = params_conv_in["kernel"]
    kernel = jnp.tile(kernel, (1, 1, repeat, 1)) / repeat
    return {"kernel": kernel, "bias": params_conv_in["bias"]}
