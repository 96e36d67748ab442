"""AutoencoderKL (Stable Diffusion 2 VAE) in Flax, NHWC.

The reference consumes diffusers' AutoencoderKL (stablemtl_pipeline.py:607-656):
encode = encoder -> quant_conv -> take mean (no sampling) * 0.18215;
decode = /0.18215 -> post_quant_conv -> decoder. This file rebuilds that
architecture natively: channels (128, 256, 512, 512), 2 resnets per encoder
block, 3 per decoder block, single-head mid attention, GroupNorm eps 1e-6.

TPU notes: all convs NHWC; the encoder downsample uses the asymmetric
(0,1)x(0,1) padding SD uses so converted torch weights are bit-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ResnetBlock, UpsampleConv


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: str = "float32"
    # bf16 fast path: GroupNorms emit compute dtype (stats stay f32).
    fast_math: bool = False

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


def tiny_vae_config(**kw) -> VAEConfig:
    base = dict(block_out_channels=(16, 32, 32, 32), norm_groups=8)
    base.update(kw)
    return VAEConfig(**base)


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial tokens (SD VAE mid block)."""

    channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.attention import dot_product_attention

        B, H, W, C = x.shape
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6,
                         dtype=self.norm_dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C).astype(self.dtype)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        # single-head attention over H*W tokens; at 512x512 input this is
        # 4096 tokens — route through the fused/flash dispatch
        h = dot_product_attention(q[:, :, None, :], k[:, :, None, :],
                                  v[:, :, None, :])[:, :, 0, :]
        h = nn.Dense(C, dtype=self.dtype, name="to_out_0")(h)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = cfg.jnp_dtype
        ndt = dtype if cfg.fast_math else jnp.float32
        ch = cfg.block_out_channels
        x = x.astype(dtype)

        h = nn.Conv(ch[0], (3, 3), padding=((1, 1), (1, 1)), dtype=dtype,
                    name="conv_in")(x)
        for i in range(len(ch)):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(out_channels=ch[i], use_temb=False,
                                norm_dtype=ndt,
                                groups=cfg.norm_groups, eps=1e-6, dtype=dtype,
                                name=f"down_blocks_{i}_resnets_{j}")(h)
            if i < len(ch) - 1:
                # SD VAE downsample: stride-2 conv with (0,1)x(0,1) padding
                h = nn.Conv(ch[i], (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=dtype,
                            name=f"down_blocks_{i}_downsamplers_0_conv")(h)

        h = ResnetBlock(out_channels=ch[-1], use_temb=False, norm_dtype=ndt,
                        groups=cfg.norm_groups, eps=1e-6, dtype=dtype,
                        name="mid_block_resnets_0")(h)
        h = VAEAttention(ch[-1], cfg.norm_groups, dtype=dtype,
                         norm_dtype=ndt,
                         name="mid_block_attentions_0")(h)
        h = ResnetBlock(out_channels=ch[-1], use_temb=False, norm_dtype=ndt,
                        groups=cfg.norm_groups, eps=1e-6, dtype=dtype,
                        name="mid_block_resnets_1")(h)

        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, dtype=ndt,
                         name="conv_norm_out")(h)
        h = nn.silu(h).astype(dtype)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dtype, name="conv_out")(h)
        return h  # moments [B, h, w, 2*latent]


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dtype = cfg.jnp_dtype
        ndt = dtype if cfg.fast_math else jnp.float32
        rev_ch = list(reversed(cfg.block_out_channels))
        h = z.astype(dtype)

        h = nn.Conv(rev_ch[0], (3, 3), padding=((1, 1), (1, 1)), dtype=dtype,
                    name="conv_in")(h)
        h = ResnetBlock(out_channels=rev_ch[0], use_temb=False, norm_dtype=ndt,
                        groups=cfg.norm_groups, eps=1e-6, dtype=dtype,
                        name="mid_block_resnets_0")(h)
        h = VAEAttention(rev_ch[0], cfg.norm_groups, dtype=dtype,
                         norm_dtype=ndt,
                         name="mid_block_attentions_0")(h)
        h = ResnetBlock(out_channels=rev_ch[0], use_temb=False, norm_dtype=ndt,
                        groups=cfg.norm_groups, eps=1e-6, dtype=dtype,
                        name="mid_block_resnets_1")(h)

        for i in range(len(rev_ch)):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(out_channels=rev_ch[i], use_temb=False,
                                norm_dtype=ndt,
                                groups=cfg.norm_groups, eps=1e-6, dtype=dtype,
                                name=f"up_blocks_{i}_resnets_{j}")(h)
            if i < len(rev_ch) - 1:
                # exact nearest-2x + conv as one stride-2 transposed conv
                # (ops/phase_upsample.py) — param names unchanged
                h = UpsampleConv(rev_ch[i], dtype=dtype,
                                 name=f"up_blocks_{i}_upsamplers_0_conv")(h)

        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, dtype=ndt,
                         name="conv_norm_out")(h)
        h = nn.silu(h).astype(dtype)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dtype, name="conv_out")(h)
        return h


class AutoencoderKL(nn.Module):
    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        dtype = self.config.jnp_dtype
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=dtype, name="post_quant_conv")

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def encode(self, x):
        """Image [-1,1] NHWC -> scaled latent mean (no sampling).

        Parity with reference encode_rgb (stablemtl_pipeline.py:607-624).
        """
        moments = self.encode_moments(x)
        mean, _ = jnp.split(moments, 2, axis=-1)
        return mean * self.config.scaling_factor

    def decode(self, latent):
        """Scaled latent -> image (NHWC)."""
        z = latent / self.config.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        return self.decode(self.encode(x))
