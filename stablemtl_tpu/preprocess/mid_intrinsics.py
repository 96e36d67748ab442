"""MID-Intrinsics offline preprocessing: EXR HDR -> tone-mapped rasters.

Port of reference dataset_preprocess/mid_intrinsics/preprocess.py:34-283:
tone-mapped jpg from the HDR render, albedo passthrough, and
shading = rgb / albedo, plus test/lite/vis split-file writing.

EXR reading: OpenEXR is not in this environment; imageio (with an EXR
plugin) or cv2 (if built with OpenEXR) are tried at call time, and a clear
error is raised otherwise — the math below is IO-agnostic.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .hypersim import GAMMA, tonemap_scale


def read_exr(path: str) -> np.ndarray:
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
        if img is not None:
            return img[..., ::-1].astype(np.float32)
    except Exception:
        pass
    try:
        import imageio.v3 as iio

        return np.asarray(iio.imread(path)).astype(np.float32)
    except Exception as e:
        raise RuntimeError(
            f"No EXR reader available for {path}; install OpenEXR or an "
            "imageio EXR plugin") from e


def tone_map_mid(rgb_hdr: np.ndarray,
                 valid_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """CGIntrinsics-style tone map (same scale rule as Hypersim)."""
    scale = tonemap_scale(rgb_hdr, valid_mask)
    return np.clip(np.power(np.maximum(scale * rgb_hdr, 0), GAMMA), 0, 1)


def shading_from_albedo(rgb: np.ndarray, albedo: np.ndarray,
                        eps: float = 1e-6) -> np.ndarray:
    return rgb / np.maximum(albedo, eps)


def process_scene(render_exr: str, albedo_exr: str, out_prefix: str) -> dict:
    """One render: writes <prefix>.jpg, <prefix>_albedo.jpg,
    <prefix>_shading.jpg (the layout mid_intrinsic_dataset.py:21-25 reads)."""
    import cv2

    rgb = read_exr(render_exr)
    albedo = read_exr(albedo_exr)
    rgb_tm = tone_map_mid(rgb)
    albedo_tm = np.clip(np.power(np.maximum(albedo, 0), GAMMA), 0, 1)
    shading = np.clip(shading_from_albedo(rgb_tm, albedo_tm), 0, 1)

    os.makedirs(os.path.dirname(os.path.abspath(out_prefix)), exist_ok=True)
    for suffix, img in (("", rgb_tm), ("_albedo", albedo_tm),
                        ("_shading", shading)):
        cv2.imwrite(f"{out_prefix}{suffix}.jpg",
                    cv2.cvtColor((img * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
    return {"rgb": f"{out_prefix}.jpg"}


def write_split_files(out_dir: str, names: List[str],
                      test_frac: float = 0.2, lite_every: int = 10) -> None:
    """test/lite/vis split lists (preprocess.py:250-283)."""
    os.makedirs(out_dir, exist_ok=True)
    n_test = int(len(names) * test_frac)
    with open(os.path.join(out_dir, "test.txt"), "w") as f:
        f.write("\n".join(names[:n_test]))
    with open(os.path.join(out_dir, "val.txt"), "w") as f:
        f.write("\n".join(names[n_test:]))
    with open(os.path.join(out_dir, "lite.txt"), "w") as f:
        f.write("\n".join(names[::lite_every]))
