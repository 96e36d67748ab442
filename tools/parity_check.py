#!/usr/bin/env python
"""Activation/metric parity harness against reference checkpoints.

The north-star (BASELINE.md) is matching the reference eval_mtl.py metrics
within 1% using its released checkpoints (HF anhquancao/StableMTL). This
environment has no network egress, so this script is the executable recipe
for when the weights are present:

1. Convert:  python tools/convert_sd2.py --sd2_dir <sd2> \
                 --unet_pth <single_stream_unet.pth> --out_dir ckpt_flax
2. Activation parity (this script, stage=activations): encode a fixture
   image through the converted VAE and run the UNet at t=999; print latent
   statistics to compare against the same probe run under the PyTorch
   reference (tools/reference_probe.py snippet in the docstring below).
3. Metric parity (stage=metrics): run the full eval suite
   (stablemtl_tpu.cli.eval --split test) on the real datasets and diff the
   CSV against the reference's eval_mtl.py output.

Reference-side probe (run inside the upstream repo, PyTorch):
    pipe = StableMTLPipeline.from_pretrained(...)
    lat = pipe.encode_rgb(img)                       # [-1,1] tensor
    print(lat.mean().item(), lat.std().item(), lat[0,:, :2, :2])
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fixture_parity():
    """No checkpoints in the environment: prove the CONVERSION path
    numerically against independent PyTorch implementations (torch.nn
    twins + the actual transformers CLIP) and print max-abs diffs as JSON.
    The same probes run in CI (tests/test_activation_parity.py)."""
    import json
    import sys as _sys

    # numerical conversion check: run on CPU f32 (the TPU backend defaults
    # f32 matmuls to bf16 precision, which would drown the signal)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    import tests.test_activation_parity as tap
    import numpy as _np
    import torch
    import jax.numpy as _jnp

    out = {}

    torch.manual_seed(0)
    tm = tap._TorchResnet(16, 32, temb_dim=24, groups=8).eval()
    from stablemtl_tpu.models.torch_convert import convert_unet_state_dict
    params = convert_unet_state_dict(
        tap._np_state_dict(tm, "down_blocks.0.resnets.0."))[
        "down_blocks_0_resnets_0"]
    x, temb = torch.randn(2, 16, 8, 8), torch.randn(2, 24)
    with torch.no_grad():
        want = tm(x, temb).numpy()
    from stablemtl_tpu.models.layers import ResnetBlock
    got = ResnetBlock(out_channels=32, groups=8, eps=1e-5).apply(
        {"params": params}, _jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        _jnp.asarray(temb.numpy()))
    out["resnet_block_max_abs_diff"] = float(
        _np.abs(_np.transpose(got, (0, 3, 1, 2)) - want).max())

    torch.manual_seed(1)
    tt = tap._TorchTransformer2D(32, 24, 2).eval()
    params = convert_unet_state_dict(
        tap._np_state_dict(tt, "down_blocks.0.attentions.0."))[
        "down_blocks_0_attentions_0"]
    x, ctx = torch.randn(2, 32, 6, 6), torch.randn(2, 5, 24)
    with torch.no_grad():
        want = tt(x, ctx).numpy()
    from stablemtl_tpu.models.transformer import Transformer2D
    got, _ = Transformer2D(heads=2, dim_head=16).apply(
        {"params": params}, _jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        _jnp.asarray(ctx.numpy()))
    out["transformer2d_max_abs_diff"] = float(
        _np.abs(_np.transpose(got, (0, 3, 1, 2)) - want).max())

    try:
        import transformers as hf

        torch.manual_seed(2)
        tc = hf.CLIPTextModel(hf.CLIPTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_attention_heads=2, num_hidden_layers=2,
            max_position_embeddings=77, hidden_act="gelu")).eval()
        from stablemtl_tpu.models.clip import CLIPTextConfig, CLIPTextModel
        from stablemtl_tpu.models.torch_convert import (
            convert_clip_text_state_dict)
        params = convert_clip_text_state_dict(tap._np_state_dict(tc))
        ids = torch.randint(0, 99, (2, 8))
        with torch.no_grad():
            want = tc(input_ids=ids).last_hidden_state.numpy()
        got = CLIPTextModel(CLIPTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_heads=2, num_layers=2, max_position_embeddings=77,
            hidden_act="gelu")).apply({"params": params},
                                      _jnp.asarray(ids.numpy()))
        out["clip_text_vs_transformers_max_abs_diff"] = float(
            _np.abs(_np.asarray(got) - want).max())
    except ImportError:
        out["clip_text_vs_transformers_max_abs_diff"] = None

    # composed full-model parity (VERDICT round-2 #1): whole tiny UNet
    # (skip ordering, t-embedding, 16-layer tap order) + whole tiny VAE
    # against torch twins (tests/test_full_model_parity.py, also in CI).
    # That module's pytest.importorskip(torch) raises outside pytest on a
    # torch-less host — degrade to None like the other torch-gated probes
    # instead of killing the whole report.
    try:
        import tests.test_full_model_parity as tfp

        final, tap_diffs = tfp.full_unet_parity()
        out["full_unet_max_abs_diff"] = final
        out["full_unet_tap_max_abs_diff"] = max(tap_diffs)
        enc_d, dec_d, rt_d = tfp.vae_parity()
        out["vae_encode_max_abs_diff"] = enc_d
        out["vae_decode_max_abs_diff"] = dec_d  # torch latent -> flax dec
        out["vae_roundtrip_max_abs_diff"] = rt_d
    except BaseException as e:  # pytest.Skipped subclasses BaseException
        if type(e).__name__ not in ("Skipped", "ImportError",
                                    "ModuleNotFoundError"):
            raise
        for k in ("full_unet_max_abs_diff", "full_unet_tap_max_abs_diff",
                  "vae_encode_max_abs_diff", "vae_decode_max_abs_diff",
                  "vae_roundtrip_max_abs_diff"):
            out[k] = None

    out["pass"] = all(v is None or v < 1e-4 for v in out.values())
    print(json.dumps(out, indent=2))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None,
                    help="converted weight dir (tools/convert_sd2.py output)")
    ap.add_argument("--image", default=None,
                    help="fixture image (default: deterministic gradient)")
    ap.add_argument("--multi_stream", action="store_true")
    ap.add_argument("--res", type=int, default=256,
                    help="fixture probe resolution (use 64 on the 1-core "
                         "host to keep the full-size CPU forward tractable)")
    ap.add_argument("--fixture", action="store_true",
                    help="run the torch-twin activation-parity probes "
                         "(no checkpoints needed) and print diff numbers")
    args = ap.parse_args()

    if args.fixture or not args.weights:
        fixture_parity()
        if not args.weights:
            return

    import jax.numpy as jnp

    from stablemtl_tpu.config import Config
    from stablemtl_tpu.factory import build_pipeline
    from stablemtl_tpu.pipeline import TASKS, jit_infer
    from stablemtl_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = Config({
        "model": {"pretrained_path": args.weights, "size_preset": "full",
                  "compute_dtype": "float32"},
        "trainer": {"multi_stream": bool(args.multi_stream)},
        "pipeline": {},
    })
    pipe = build_pipeline(cfg)

    if args.image:
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB"),
                         np.float32) / 255.0 * 2 - 1
    else:
        h = w = args.res
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([xx / w, yy / h, (xx + yy) / (h + w)],
                       -1).astype(np.float32) * 2 - 1
    rgb = jnp.asarray(img[None])

    lat = np.asarray(pipe.encode_rgb(rgb))
    print(f"latent: mean {lat.mean():+.6f} std {lat.std():.6f}")
    print("latent[0,:2,:2,:] =")
    print(np.array2string(lat[0, :2, :2, :], precision=5))

    infer = jit_infer(pipe)
    for task in TASKS:
        out = np.asarray(infer(rgb, rgb, np.asarray(
            TASKS.index(task), np.int32)))
        print(f"{task:>13s}: pred mean {out.mean():+.6f} "
              f"std {out.std():.6f} min {out.min():+.4f} max {out.max():+.4f}")


if __name__ == "__main__":
    main()
