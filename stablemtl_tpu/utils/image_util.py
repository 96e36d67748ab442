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
                   interpolation=None) -> np.ndarray:
    """Resize HWC image so the longer edge equals max_edge_resolution,
    preserving aspect (reference image_util.py:79-109).

    The reference resizes with torchvision antialias=True; plain
    cv2.INTER_LINEAR decimation has no antialias filter and aliases on
    downscale, so the default here is INTER_AREA (antialiased) when
    shrinking and INTER_LINEAR when enlarging. Pass `interpolation`
    explicitly to override.
    """
    h, w = img.shape[:2]
    scale = min(max_edge_resolution / w, max_edge_resolution / h)
    nw, nh = int(w * scale), int(h * scale)
    if interpolation is None:
        interpolation = cv2.INTER_AREA if scale < 1.0 else cv2.INTER_LINEAR
    out = cv2.resize(img, (nw, nh), interpolation=interpolation)
    return out[..., None] if out.ndim == 2 and img.ndim == 3 else out


def chw2hwc(img: np.ndarray) -> np.ndarray:
    return np.transpose(img, (1, 2, 0))


def multi_res_noise_like(rng: jax.Array, x: jnp.ndarray,
                         strength: float = 0.9,
                         downscale_strategy: str = "original") -> jnp.ndarray:
    """Pyramid noise with per-octave downscaling (multi_res_noise.py:9-75).

    x: [B, H, W, C] (NHWC). Returns unit-variance noise.

    Host-side helper, NOT jit-traceable: the reference's octave
    resolutions are data-dependent shapes (random divisors with a break
    at 1 px, multi_res_noise.py:24-33). The octave schedule — including
    the reference's cumulative w,h mutation across iterations and its
    full-resolution i=0 octave in 'original'/'power_of_two' — is computed
    with a host RNG derived from the key, so the function stays pure in
    (rng, x.shape). Off in every shipped config (input_noise:
    deterministic), matching the reference default.
    """
    b, h, w, c = x.shape
    rng, sub = jax.random.split(rng)
    noise = jax.random.normal(sub, x.shape, jnp.float32)

    try:  # legacy uint32[2] keys; typed keys need key_data
        key_arr = np.asarray(rng)
    except TypeError:
        key_arr = np.asarray(jax.random.key_data(rng))
    host = np.random.default_rng(np.random.SeedSequence(
        key_arr.ravel().astype(np.uint32).tolist()))

    octaves = []  # (nh, nw, weight) — reference mutates w,h cumulatively
    ch, cw = h, w
    if downscale_strategy == "original":
        for i in range(10):
            r = host.uniform() * 2 + 2  # random divisor in [2, 4)
            ch, cw = max(1, int(ch / (r ** i))), max(1, int(cw / (r ** i)))
            octaves.append((ch, cw, strength ** i))
            if ch == 1 or cw == 1:
                break
    elif downscale_strategy == "every_layer":
        for i in range(int(math.log2(min(h, w)))):
            ch, cw = max(1, ch // 2), max(1, cw // 2)
            octaves.append((ch, cw, strength ** i))
    elif downscale_strategy == "power_of_two":
        for i in range(10):
            ch, cw = max(1, int(ch / (2 ** i))), max(1, int(cw / (2 ** i)))
            octaves.append((ch, cw, strength ** i))
            if ch == 1 or cw == 1:
                break
    elif downscale_strategy == "random_step":
        for i in range(10):
            r = host.uniform() * 2 + 2
            ch, cw = max(1, int(ch / r)), max(1, int(cw / r))
            octaves.append((ch, cw, strength ** i))
            if ch == 1 or cw == 1:
                break
    else:
        raise ValueError(f"unknown downscale strategy: {downscale_strategy}")

    for nh, nw, wgt in octaves:
        rng, sub = jax.random.split(rng)
        small = jax.random.normal(sub, (b, nh, nw, c), jnp.float32)
        up = jax.image.resize(small, (b, h, w, c), method="bilinear")
        noise = noise + up * wgt
    return noise / jnp.std(noise)
