#!/usr/bin/env python
"""Convert Stable Diffusion 2 (diffusers layout) torch weights -> npz trees
this framework loads (factory.load_pretrained).

Usage:
    python tools/convert_sd2.py --sd2_dir /path/to/stable-diffusion-2 \
        --out_dir checkpoints/sd2_flax

Reads <sd2_dir>/{unet,vae,text_encoder}/diffusion_pytorch_model.bin (or
.safetensors) with torch on CPU, converts layouts (models/torch_convert),
precomputes the 7-task text-embedding table with the real CLIP tokenizer
(<sd2_dir>/tokenizer), and writes unet.npz / vae.npz / text_table.npy.

Also supports the reference StableMTL checkpoints (e.g.
single_stream_unet.pth) via --unet_pth.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_torch_state(path: str):
    import torch

    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(path)
    else:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def _find_weights(model_dir: str):
    for name in ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin", "model.safetensors",
                 "pytorch_model.bin"):
        p = os.path.join(model_dir, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no weights found in {model_dir}")


def _save_tree(tree: dict, path: str):
    from stablemtl_tpu.models.torch_convert import flatten_tree

    flat = {k.replace(".", "/"): v for k, v in flatten_tree(tree).items()}
    np.savez(path, **flat)
    print(f"wrote {path} ({len(flat)} arrays)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sd2_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--unet_pth", default=None,
                    help="optional reference StableMTL unet .pth to convert "
                         "instead of the SD2 unet")
    ap.add_argument("--inflate_conv_in", type=int, default=0,
                    help="pre-inflate the UNet conv_in input channels by "
                         "this repeat factor (3 for the 12-ch model, 2 for "
                         "'avg' mode; reference util/model.py:11-27). 0 "
                         "leaves the stored kernel as-is — "
                         "factory.load_pretrained also inflates "
                         "automatically on shape mismatch.")
    args = ap.parse_args()

    # Host-side tool: force CPU BEFORE any jnp op (inflate_conv_in uses
    # jnp.tile) and via the ENV VAR, not just the config update — backends
    # are cached, and a converter grabbing the axon tunnel next to a
    # running bench wedges both (CLAUDE.md hazards).
    os.environ["JAX_PLATFORMS"] = "cpu"
    # blanking the axon pool IP skips axon registration entirely — the
    # only reliable isolation (CLAUDE.md: even JAX_PLATFORMS=cpu processes
    # otherwise dial the tunnel at first backends() call)
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from stablemtl_tpu.models.torch_convert import (
        convert_clip_text_state_dict,
        convert_unet_state_dict,
        convert_vae_state_dict,
    )

    os.makedirs(args.out_dir, exist_ok=True)

    vae_sd = _load_torch_state(_find_weights(os.path.join(args.sd2_dir,
                                                          "vae")))
    _save_tree({"params": convert_vae_state_dict(vae_sd)},
               os.path.join(args.out_dir, "vae.npz"))

    unet_src = args.unet_pth or _find_weights(
        os.path.join(args.sd2_dir, "unet"))
    unet_sd = _load_torch_state(unet_src)
    unet_tree = convert_unet_state_dict(unet_sd)
    if args.inflate_conv_in > 1:
        from stablemtl_tpu.models.unet import inflate_conv_in

        conv_in = unet_tree["params"]["conv_in"] \
            if "params" in unet_tree else unet_tree["conv_in"]
        inflated = inflate_conv_in(
            {"kernel": conv_in["kernel"], "bias": conv_in["bias"]},
            repeat=args.inflate_conv_in)
        conv_in["kernel"] = np.asarray(inflated["kernel"])
        print(f"inflated conv_in to {conv_in['kernel'].shape}")
    _save_tree({"params": unet_tree},
               os.path.join(args.out_dir, "unet.npz"))

    # text tower -> 7-task embedding table
    text_sd = _load_torch_state(_find_weights(
        os.path.join(args.sd2_dir, "text_encoder")))
    text_tree = {"params": convert_clip_text_state_dict(text_sd)}

    from stablemtl_tpu.models import CLIPTextConfig, CLIPTextModel
    from stablemtl_tpu.models.clip import get_tokenizer
    from stablemtl_tpu.pipeline import build_text_embed_table

    clip = CLIPTextModel(CLIPTextConfig())
    tok = get_tokenizer(os.path.join(args.sd2_dir, "tokenizer"))
    table = build_text_embed_table(clip, text_tree, tokenizer=tok)
    np.save(os.path.join(args.out_dir, "text_table.npy"),
            np.asarray(table))
    print(f"wrote text_table.npy {tuple(table.shape)}")


if __name__ == "__main__":
    main()
