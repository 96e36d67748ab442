#!/usr/bin/env python
"""Host data-pipeline throughput: can the loader feed the training step?

Builds a synthetic vkitti depth tree at the reference training resolution
(288x384, train_base_config geometry), then measures MixedTaskLoader
batches/sec and samples/sec with prefetch off and on. Pure host work — no
device, safe to run anywhere with JAX_PLATFORMS=cpu.

Context: the measured single-chip training rate is ~11 img/s at 288x384
(BENCH_NOTES.md), i.e. ~5.5 batches/s at batch 2. The loader must sustain
that; the prefetch thread additionally overlaps its cost with device steps
(the reference instead uses 16 torch dataloader workers,
train_base_config.yaml:60).

Env: STABLEMTL_BENCH_BATCH (2), STABLEMTL_BENCH_STEPS (24),
     STABLEMTL_BENCH_RES ("288x384").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_tree(root: str, h: int, w: int, n: int = 16) -> str:
    import cv2
    from PIL import Image

    base = os.path.join(root, "vkitti/Scene01/clone/frames")
    os.makedirs(os.path.join(base, "depth/Camera_0"), exist_ok=True)
    os.makedirs(os.path.join(base, "rgb/Camera_0"), exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        rgb = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        for fid in (i, i + 1):
            Image.fromarray(rgb).save(
                os.path.join(base, f"rgb/Camera_0/rgb_{fid:05d}.jpg"))
        cv2.imwrite(os.path.join(base, f"depth/Camera_0/depth_{i:05d}.png"),
                    rng.uniform(100, 2000, (h, w)).astype(np.uint16))
        lines.append(f"Scene01/clone/frames/depth/Camera_0/depth_{i:05d}.png")
    lst = os.path.join(root, "depth_list.txt")
    with open(lst, "w") as f:
        f.write("\n".join(lines))
    return lst


def main():
    batch = int(os.environ.get("STABLEMTL_BENCH_BATCH", "2"))
    steps = int(os.environ.get("STABLEMTL_BENCH_STEPS", "24"))
    h, w = (int(x) for x in os.environ.get(
        "STABLEMTL_BENCH_RES", "288x384").split("x"))

    from stablemtl_tpu.data.augmentation import AugmentationConfig
    from stablemtl_tpu.data.base import DatasetMode
    from stablemtl_tpu.data.datasets import get_dataset
    from stablemtl_tpu.data.loader import MixedTaskLoader
    from stablemtl_tpu.utils.normalizers import get_depth_normalizer

    # the default training augmentation (train_base_config.yaml:78-90)
    train_aug = AugmentationConfig.from_dict({
        "enabled": True,
        "random_horizontal_flip": {"enabled": True},
        "color_jitter": {"enabled": True, "brightness": 0.4,
                         "contrast": 0.4, "saturation": 0.4, "hue": 0.159}})

    root = tempfile.mkdtemp(prefix="bench_loader_")
    try:
        lst = build_tree(root, h, w)

        def make_ds(aug):
            return get_dataset(
                {"name": "vkitti_depth", "dir": "vkitti",
                 "disp_name": "bench", "filenames": lst,
                 "resize_to_hw": [h, w], "augmentation": aug,
                 "depth_normalizer": get_depth_normalizer(
                     {"type": "scale_shift_depth", "clip": True,
                      "norm_min": -1.0, "norm_max": 1.0,
                      "min_max_quantile": 0.02})},
                base_data_dir=root, mode=DatasetMode.TRAIN)

        for tag, aug, prefetch, workers in (("plain", None, 0, 0),
                                            ("plain", None, 2, 0),
                                            ("aug", train_aug, 0, 0),
                                            ("aug", train_aug, 0, 2),
                                            ("aug", train_aug, 0, 4)):
            loader = MixedTaskLoader([make_ds(aug)], batch_size=batch,
                                     seed=0, prefetch=prefetch,
                                     num_workers=workers)
            it = loader.batches(max_steps=steps + 2)
            next(it); next(it)  # warm caches / thread or pool spin-up
            t0 = time.perf_counter()
            n = 0
            for b in it:
                assert b["rgb_norm"].shape == (batch, h, w, 3)
                n += 1
            dt = time.perf_counter() - t0
            print(json.dumps({
                "variant":
                    f"loader_{h}x{w}_b{batch}_{tag}_prefetch{prefetch}"
                    f"_workers{workers}",
                "batches_per_sec": round(n / dt, 2),
                "samples_per_sec": round(n * batch / dt, 2)}), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
