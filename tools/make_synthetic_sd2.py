#!/usr/bin/env python
"""Generate a FULL-SIZE synthetic Stable Diffusion 2 checkpoint directory
(diffusers on-disk layout: unet/ vae/ text_encoder/ *.bin) so the
convert_sd2.py -> factory.load_pretrained ingestion pipeline can be proven
at real scale without network egress (VERDICT r2 next #8; the real
checkpoints are listed at reference README.md:317-345).

The torch key names are derived from THIS framework's full-size flax param
trees by inverting torch_convert's name/layout mapping, then self-checked:
the generated state dict is run back through convert_{unet,vae,clip}_
state_dict and the resulting pytree must match the model-init tree leaf-
for-leaf (same keys, same shapes). A mismatch is a hard error, so the
generator cannot silently drift from the converter.

Usage:
    python tools/make_synthetic_sd2.py --out_dir /tmp/sd2_synth [--seed 0]

Then (the timed ingestion recipe, see .claude/skills/verify/SKILL.md):
    /usr/bin/time -v python tools/convert_sd2.py \
        --sd2_dir /tmp/sd2_synth --out_dir /tmp/sd2_flax
    /usr/bin/time -v python tools/parity_check.py \
        --weights /tmp/sd2_flax --res 64
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_MODULE_NAMES = ("down_blocks|up_blocks|attentions|resnets|downsamplers|"
                 "upsamplers|transformer_blocks|layers")
_GENERIC = re.compile(rf"({_MODULE_NAMES})_(\d+)")


def _unflatten_module_path(key: str) -> str:
    """Inverse of torch_convert._flatten_module_path (+ the VAE glue)."""
    # VAE glue: encoder.down_blocks_0_downsamplers_0_conv -> ...0.conv
    key = re.sub(r"(downsamplers|upsamplers)_(\d+)_conv\.",
                 r"\1_\2.conv.", key)
    prev = None
    while prev != key:
        prev = key
        key = _GENERIC.sub(lambda m: f"{m.group(1)}.{m.group(2)}", key)
    # re-split the glued module-name groups
    key = key.replace("mid_block_resnets.", "mid_block.resnets.")
    key = key.replace("mid_block_attentions.", "mid_block.attentions.")
    key = re.sub(r"(down_blocks|up_blocks)\.(\d+)_"
                 r"(resnets|attentions|downsamplers|upsamplers)\.",
                 r"\1.\2.\3.", key)
    # our-name -> diffusers-name quirks (inverse of convert_*_state_dict)
    key = key.replace(".to_out_0.", ".to_out.0.")
    key = key.replace(".ff.net_0.proj.", ".ff.net.0.proj.")
    key = key.replace(".ff.net_2.", ".ff.net.2.")
    return key


def _flat_leaves(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flat_leaves(v, p)
        else:
            yield p, v


def _torch_entry(flat_key: str, shape, rng) -> tuple[str, np.ndarray]:
    """Map one flax leaf (path, abstract shape) to (torch_key, value)."""
    path, leaf = flat_key.rsplit(".", 1)
    tkey = _unflatten_module_path(path)
    if leaf == "kernel":
        if len(shape) == 4:  # conv [kh,kw,I,O] -> [O,I,kh,kw]
            v = _fill(shape, rng).transpose(3, 2, 0, 1)
        else:                # linear [I,O] -> [O,I]
            v = _fill(shape, rng).transpose(1, 0)
        return f"{tkey}.weight", v
    if leaf == "scale":
        return f"{tkey}.weight", np.ones(shape, np.float32)
    if leaf == "bias":
        return f"{tkey}.bias", np.zeros(shape, np.float32)
    raise KeyError(flat_key)


def _fill(shape, rng) -> np.ndarray:
    return (rng.standard_normal(shape) * 0.02).astype(np.float32)


def _unet_state_dict(tree, rng):
    sd = {}
    for k, sh in _flat_leaves(tree["params"]):
        sd.update([_torch_entry(k, sh.shape, rng)])
    return sd


def _vae_state_dict(tree, rng):
    return _unet_state_dict(tree, rng)


def _clip_state_dict(tree, rng):
    """Inverse of convert_clip_text_state_dict's flat layout."""
    sd = {}
    for k, sh in _flat_leaves(tree["params"]):
        if k == "token_embedding":
            sd["text_model.embeddings.token_embedding.weight"] = \
                _fill(sh.shape, rng)
            continue
        if k == "position_embedding":
            sd["text_model.embeddings.position_embedding.weight"] = \
                _fill(sh.shape, rng)
            continue
        m = re.match(r"layers_(\d+)_(.*)\.(kernel|scale|bias)", k)
        if m:
            i, sub, leaf = m.groups()
            if re.fullmatch(r"[qkv]_proj|out_proj", sub):
                sub = f"self_attn.{sub}"
            elif sub in ("fc1", "fc2"):
                sub = f"mlp.{sub}"
            tkey = f"text_model.encoder.layers.{i}.{sub}"
        elif k.startswith("final_layer_norm."):
            leaf = k.split(".")[-1]
            tkey = "text_model.final_layer_norm"
        else:
            raise KeyError(k)
        if leaf == "kernel":
            sd[f"{tkey}.weight"] = _fill(sh.shape, rng).transpose(1, 0)
        elif leaf == "scale":
            sd[f"{tkey}.weight"] = np.ones(sh.shape, np.float32)
        else:
            sd[f"{tkey}.bias"] = np.zeros(sh.shape, np.float32)
    return sd


def _self_check(name, converted_params, init_tree):
    got = {k: v.shape for k, v in _flat_leaves(converted_params)}
    want = {k: v.shape for k, v in _flat_leaves(init_tree["params"])}
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    bad = sorted(k for k in set(got) & set(want)
                 if tuple(got[k]) != tuple(want[k]))
    if missing or extra or bad:
        raise SystemExit(
            f"{name} round-trip mismatch:\n missing={missing[:8]}\n "
            f"extra={extra[:8]}\n shape={[(k, got[k], want[k]) for k in bad[:8]]}")
    print(f"{name}: {len(want)} leaves round-trip OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # Host-side tool: force CPU via the ENV VAR (not just the config
    # update) and skip axon registration entirely — the sitecustomize hook
    # otherwise creates the axon PJRT client at first backends() call and
    # queues on the single tunnel claim next to a running bench
    # (CLAUDE.md hazards; same pattern as convert_sd2.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from stablemtl_tpu.models import (AutoencoderKL, CLIPTextConfig,
                                      CLIPTextModel, UNet2DConditionModel)
    from stablemtl_tpu.models.torch_convert import (
        convert_clip_text_state_dict, convert_unet_state_dict,
        convert_vae_state_dict)
    from stablemtl_tpu.models.unet import UNetConfig
    from stablemtl_tpu.models.vae import VAEConfig

    rng = np.random.RandomState(args.seed)

    # original SD2 shapes: 4-channel conv_in, no task modules — the
    # factory inflates conv_in to 12ch on load (util/model.py:11-27)
    unet = UNet2DConditionModel(UNetConfig(in_channels=4))
    unet_tree = jax.eval_shape(
        lambda r: unet.init(r, jnp.zeros((1, 8, 8, 4)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 5, 1024))), jax.random.PRNGKey(0))
    unet_sd = _unet_state_dict(unet_tree, rng)
    _self_check("unet", convert_unet_state_dict(unet_sd), unet_tree)

    vae = AutoencoderKL(VAEConfig())
    vae_tree = jax.eval_shape(
        lambda r: vae.init(r, jnp.zeros((1, 64, 64, 3))),
        jax.random.PRNGKey(0))
    vae_sd = _vae_state_dict(vae_tree, rng)
    _self_check("vae", convert_vae_state_dict(vae_sd), vae_tree)

    clip = CLIPTextModel(CLIPTextConfig())
    clip_tree = jax.eval_shape(
        lambda r: clip.init(r, jnp.zeros((1, 5), jnp.int32)),
        jax.random.PRNGKey(0))
    clip_sd = _clip_state_dict(clip_tree, rng)
    _self_check("text_encoder", convert_clip_text_state_dict(clip_sd),
                clip_tree)

    for sub, sd in (("unet", unet_sd), ("vae", vae_sd),
                    ("text_encoder", clip_sd)):
        d = os.path.join(args.out_dir, sub)
        os.makedirs(d, exist_ok=True)
        name = ("diffusion_pytorch_model.bin" if sub != "text_encoder"
                else "pytorch_model.bin")
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, os.path.join(d, name))
        n = sum(v.size for v in sd.values())
        print(f"wrote {sub}/{name}: {len(sd)} tensors, "
              f"{n/1e6:.1f}M params")


if __name__ == "__main__":
    main()
