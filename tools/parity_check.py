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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True,
                    help="converted weight dir (tools/convert_sd2.py output)")
    ap.add_argument("--image", default=None,
                    help="fixture image (default: deterministic gradient)")
    ap.add_argument("--multi_stream", action="store_true")
    args = ap.parse_args()

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
        h = w = 256
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
