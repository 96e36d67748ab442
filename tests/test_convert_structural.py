"""Structural parity: converting a synthetic SD2-shaped torch state dict
must produce exactly the pytree structure our Flax modules initialize —
every path present, every shape equal (via eval_shape; no compute).

This is the strongest weight-compat guarantee available without the actual
SD2 weights on disk: if structures match, tools/convert_sd2.py output loads
loss-free.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax

from stablemtl_tpu.models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    UNet2DConditionModel,
)
from stablemtl_tpu.models.torch_convert import (
    convert_clip_text_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
)
from stablemtl_tpu.models.unet import UNetConfig
from stablemtl_tpu.models.vae import VAEConfig


def _flat(tree):
    return {"/".join(map(str, k)): v for k, v in
            flax.traverse_util.flatten_dict(tree).items()}


def _expected_structure(module, *args, **kwargs):
    shapes = jax.eval_shape(lambda: module.init(
        jax.random.PRNGKey(0), *args, **kwargs))
    return {k: v.shape for k, v in _flat(shapes).items()}


# ---------------------------------------------------------------------------
# Synthetic torch state dicts shaped like diffusers SD2 modules
# ---------------------------------------------------------------------------

def synth_sd2_unet_state_dict(in_ch=12):
    """Key set of diffusers UNet2DConditionModel at SD2 geometry."""
    sd = {}
    ch = [320, 640, 1280, 1280]
    ctx = 1024

    def conv(k, o, i, s=3):
        sd[f"{k}.weight"] = np.zeros((o, i, s, s), np.float32)
        sd[f"{k}.bias"] = np.zeros((o,), np.float32)

    def lin(k, o, i, bias=True):
        sd[f"{k}.weight"] = np.zeros((o, i), np.float32)
        if bias:
            sd[f"{k}.bias"] = np.zeros((o,), np.float32)

    def norm(k, c):
        sd[f"{k}.weight"] = np.ones((c,), np.float32)
        sd[f"{k}.bias"] = np.zeros((c,), np.float32)

    def resnet(k, ci, co):
        norm(f"{k}.norm1", ci)
        conv(f"{k}.conv1", co, ci)
        lin(f"{k}.time_emb_proj", co, ch[0] * 4)
        norm(f"{k}.norm2", co)
        conv(f"{k}.conv2", co, co)
        if ci != co:
            conv(f"{k}.conv_shortcut", co, ci, s=1)

    def attn_block(k, c):
        norm(f"{k}.norm", c)
        lin(f"{k}.proj_in", c, c)
        tb = f"{k}.transformer_blocks.0"
        norm(f"{tb}.norm1", c)
        for n in ("to_q", "to_k", "to_v"):
            lin(f"{tb}.attn1.{n}", c, c, bias=False)
        lin(f"{tb}.attn1.to_out.0", c, c)
        norm(f"{tb}.norm2", c)
        lin(f"{tb}.attn2.to_q", c, c, bias=False)
        lin(f"{tb}.attn2.to_k", c, ctx, bias=False)
        lin(f"{tb}.attn2.to_v", c, ctx, bias=False)
        lin(f"{tb}.attn2.to_out.0", c, c)
        norm(f"{tb}.norm3", c)
        lin(f"{tb}.ff.net.0.proj", c * 8, c)
        lin(f"{tb}.ff.net.2", c, c * 4)
        lin(f"{k}.proj_out", c, c)

    conv("conv_in", ch[0], in_ch)
    lin("time_embedding.linear_1", ch[0] * 4, ch[0])
    lin("time_embedding.linear_2", ch[0] * 4, ch[0] * 4)

    for i in range(4):
        ci = ch[max(i - 1, 0)]
        for j in range(2):
            resnet(f"down_blocks.{i}.resnets.{j}", ci if j == 0 else ch[i],
                   ch[i])
            if i < 3:
                attn_block(f"down_blocks.{i}.attentions.{j}", ch[i])
        if i < 3:
            conv(f"down_blocks.{i}.downsamplers.0.conv", ch[i], ch[i])

    resnet("mid_block.resnets.0", ch[3], ch[3])
    attn_block("mid_block.attentions.0", ch[3])
    resnet("mid_block.resnets.1", ch[3], ch[3])

    rev = list(reversed(ch))  # 1280,1280,640,320
    # skip-channel bookkeeping mirrors diffusers up-block wiring
    down_out = [ch[0]] + [c for i, c in enumerate(ch)
                          for _ in range(2)] + ch[:3]
    # simpler: recompute skip list exactly like the model
    skips = [ch[0]]
    for i in range(4):
        skips += [ch[i]] * 2
        if i < 3:
            skips.append(ch[i])
    h = ch[3]
    for i in range(4):
        out_c = rev[i]
        for j in range(3):
            skip = skips.pop()
            resnet(f"up_blocks.{i}.resnets.{j}", h + skip, out_c)
            h = out_c
            if i > 0:
                attn_block(f"up_blocks.{i}.attentions.{j}", out_c)
        if i < 3:
            conv(f"up_blocks.{i}.upsamplers.0.conv", out_c, out_c)

    norm("conv_norm_out", ch[0])
    conv("conv_out", 4, ch[0])
    return sd


def synth_sd2_vae_state_dict():
    sd = {}
    ch = [128, 256, 512, 512]

    def conv(k, o, i, s=3):
        sd[f"{k}.weight"] = np.zeros((o, i, s, s), np.float32)
        sd[f"{k}.bias"] = np.zeros((o,), np.float32)

    def norm(k, c):
        sd[f"{k}.weight"] = np.ones((c,), np.float32)
        sd[f"{k}.bias"] = np.zeros((c,), np.float32)

    def lin(k, o, i):
        sd[f"{k}.weight"] = np.zeros((o, i), np.float32)
        sd[f"{k}.bias"] = np.zeros((o,), np.float32)

    def resnet(k, ci, co):
        norm(f"{k}.norm1", ci)
        conv(f"{k}.conv1", co, ci)
        norm(f"{k}.norm2", co)
        conv(f"{k}.conv2", co, co)
        if ci != co:
            conv(f"{k}.conv_shortcut", co, ci, s=1)

    def attn(k, c):
        norm(f"{k}.group_norm", c)
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            lin(f"{k}.{n}", c, c)

    conv("encoder.conv_in", ch[0], 3)
    for i in range(4):
        ci = ch[max(i - 1, 0)]
        for j in range(2):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   ci if j == 0 else ch[i], ch[i])
        if i < 3:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch[i],
                 ch[i])
    resnet("encoder.mid_block.resnets.0", ch[3], ch[3])
    attn("encoder.mid_block.attentions.0", ch[3])
    resnet("encoder.mid_block.resnets.1", ch[3], ch[3])
    norm("encoder.conv_norm_out", ch[3])
    conv("encoder.conv_out", 8, ch[3])

    conv("decoder.conv_in", ch[3], 4)
    resnet("decoder.mid_block.resnets.0", ch[3], ch[3])
    attn("decoder.mid_block.attentions.0", ch[3])
    resnet("decoder.mid_block.resnets.1", ch[3], ch[3])
    rev = [512, 512, 256, 128]
    h = ch[3]
    for i in range(4):
        for j in range(3):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", h, rev[i])
            h = rev[i]
        if i < 3:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", rev[i], rev[i])
    norm("decoder.conv_norm_out", ch[0])
    conv("decoder.conv_out", 3, ch[0])

    conv("quant_conv", 8, 8, s=1)
    conv("post_quant_conv", 4, 4, s=1)
    return sd


def test_unet_structure_matches_converter():
    unet = UNet2DConditionModel(UNetConfig())
    expected = _expected_structure(
        unet, jnp.zeros((1, 8, 8, 12)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 5, 1024)))
    converted = _flat({"params": convert_unet_state_dict(
        synth_sd2_unet_state_dict())})
    missing = sorted(set(expected) - set(converted))
    extra = sorted(set(converted) - set(expected))
    assert not missing, f"missing {len(missing)}: {missing[:8]}"
    assert not extra, f"extra {len(extra)}: {extra[:8]}"
    mismatched = [k for k in expected
                  if tuple(expected[k]) != tuple(np.shape(converted[k]))]
    assert not mismatched, \
        f"{len(mismatched)} shape mismatches, e.g. " + ", ".join(
            f"{k}: {expected[k]} vs {np.shape(converted[k])}"
            for k in mismatched[:5])


def synth_task_bank_keys(sd):
    """Add the reference's per-task ModuleDict params (util/model.py:102-146)
    to every attn1: MLP k/v (fc1/fc2), MLPv2 q (net.0/2/4/6), LayerNorms,
    zero-init to_out_task."""
    from stablemtl_tpu import TASKS

    attn1_prefixes = sorted({
        k.rsplit(".attn1.", 1)[0] + ".attn1" for k in sd if ".attn1." in k})
    layer_dim = {p: sd[p + ".to_q.weight"].shape[0] for p in attn1_prefixes}
    for p in attn1_prefixes:
        c = layer_dim[p]
        for t in TASKS:
            for bank in ("task_to_k", "task_to_v"):
                sd[f"{p}.{bank}.{t}.fc1.weight"] = np.zeros((c // 2, c))
                sd[f"{p}.{bank}.{t}.fc1.bias"] = np.zeros((c // 2,))
                sd[f"{p}.{bank}.{t}.fc2.weight"] = np.zeros((c, c // 2))
                sd[f"{p}.{bank}.{t}.fc2.bias"] = np.zeros((c,))
            dims = [c, 640, 640, 640, c]
            for li in range(4):
                sd[f"{p}.task_to_q.{t}.net.{2 * li}.weight"] = \
                    np.zeros((dims[li + 1], dims[li]))
                sd[f"{p}.task_to_q.{t}.net.{2 * li}.bias"] = \
                    np.zeros((dims[li + 1],))
            for nm in ("task_norm_k", "task_norm_v", "task_norm_q"):
                sd[f"{p}.{nm}.{t}.weight"] = np.ones((c,))
                sd[f"{p}.{nm}.{t}.bias"] = np.zeros((c,))
        sd[f"{p}.to_out_task.weight"] = np.zeros((c, c))
        sd[f"{p}.to_out_task.bias"] = np.zeros((c,))
    return sd


def test_multistream_unet_structure_matches_converter():
    from stablemtl_tpu.pipeline import N_TASKS

    from stablemtl_tpu.models.unet import task_feat_shapes

    cfg = UNetConfig(use_task_attention=True)
    unet = UNet2DConditionModel(cfg)
    feats = [jnp.zeros((N_TASKS - 1, 1, n, c))
             for n, c in task_feat_shapes(cfg, 8, 8)]
    expected = _expected_structure(
        unet, jnp.zeros((1, 8, 8, 12)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 5, 1024)), task_feats=feats,
        main_idx=jnp.asarray(0), aux_idx=jnp.arange(1, N_TASKS))
    sd = synth_task_bank_keys(synth_sd2_unet_state_dict())
    converted = _flat({"params": convert_unet_state_dict(sd)})
    missing = sorted(set(expected) - set(converted))
    extra = sorted(set(converted) - set(expected))
    assert not missing, f"missing {len(missing)}: {missing[:8]}"
    assert not extra, f"extra {len(extra)}: {extra[:8]}"
    mismatched = [k for k in expected
                  if tuple(expected[k]) != tuple(np.shape(converted[k]))]
    assert not mismatched, \
        ", ".join(f"{k}: {expected[k]} vs {np.shape(converted[k])}"
                  for k in mismatched[:5])


def test_vae_structure_matches_converter():
    vae = AutoencoderKL(VAEConfig())
    expected = _expected_structure(vae, jnp.zeros((1, 16, 16, 3)))
    converted = _flat({"params": convert_vae_state_dict(
        synth_sd2_vae_state_dict())})
    missing = sorted(set(expected) - set(converted))
    extra = sorted(set(converted) - set(expected))
    assert not missing, f"missing {len(missing)}: {missing[:8]}"
    assert not extra, f"extra {len(extra)}: {extra[:8]}"
    mismatched = [k for k in expected
                  if tuple(expected[k]) != tuple(np.shape(converted[k]))]
    assert not mismatched, mismatched[:5]
