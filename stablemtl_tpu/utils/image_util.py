"""Image helpers: aspect-preserving max-edge resize, multi-res noise.

Rebuild of reference src/util/image_util.py:79-109 (resize_max_res) and
src/util/multi_res_noise.py:9-75 (Marigold-style pyramid noise, unused by
the default deterministic-input config but part of the surface).
"""

from __future__ import annotations

import math

import cv2
import jax
import jax.numpy as jnp
import numpy as np


def resize_max_res(img: np.ndarray, max_edge_resolution: int,
                   interpolation=cv2.INTER_LINEAR) -> np.ndarray:
    """Resize HWC image so the longer edge equals max_edge_resolution,
    preserving aspect (reference image_util.py:79-109)."""
    h, w = img.shape[:2]
    scale = min(max_edge_resolution / w, max_edge_resolution / h)
    nw, nh = int(w * scale), int(h * scale)
    out = cv2.resize(img, (nw, nh), interpolation=interpolation)
    return out[..., None] if out.ndim == 2 and img.ndim == 3 else out


def chw2hwc(img: np.ndarray) -> np.ndarray:
    return np.transpose(img, (1, 2, 0))


def multi_res_noise_like(rng: jax.Array, x: jnp.ndarray,
                         strength: float = 0.9,
                         downscale_strategy: str = "original") -> jnp.ndarray:
    """Pyramid noise with per-octave downscaling (multi_res_noise.py:9-75).

    x: [B, H, W, C] (NHWC). Returns unit-variance noise.
    """
    b, h, w, c = x.shape
    noise = jax.random.normal(rng, x.shape, jnp.float32)
    if downscale_strategy == "original":
        factors = [2 ** (i + 1) for i in range(10)]
    elif downscale_strategy == "every_layer":
        factors = [2 ** i for i in range(int(math.log2(min(h, w))))]
    elif downscale_strategy == "power_of_two":
        factors = [2 ** (i + 1) for i in range(10)]
    else:
        raise ValueError(downscale_strategy)

    for i, f in enumerate(factors):
        nh, nw = max(1, h // f), max(1, w // f)
        if nh == 1 and nw == 1:
            break
        rng, sub = jax.random.split(rng)
        small = jax.random.normal(sub, (b, nh, nw, c), jnp.float32)
        up = jax.image.resize(small, (b, h, w, c), method="bilinear")
        noise = noise + up * (strength ** (i + 1))
    return noise / jnp.std(noise)
