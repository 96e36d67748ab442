"""Nearest-2x-upsample + 3x3 conv as ONE stride-2 transposed convolution.

The reference composes nearest-neighbor 2x upsampling with a 3x3 'same'
conv (Upsample3D, resnet.py:21-73; diffusers VAE decoder upsamplers). On
the high-res grid every output pixel's 3x3 window covers at most 2x2
DISTINCT low-res pixels (duplicated by the nearest upsample), so the
composition is exactly a stride-2 transposed convolution of the LOW-res
input with a 4x4 kernel whose taps are sums of the 3x3 taps that alias to
the same low-res pixel (1-D: w4 = [K0, K0+K1, K1+K2, K2]; 2-D is the same
grouping applied to both axes):

    out[2i+py, 2j+px] = sum_{a,b} W4[.,.] x[i+a-?, j+b-?]   (see _GROUPS)

Expressed as `lax.conv_general_dilated(x, W4, lhs_dilation=(2,2),
padding=((2,2),(2,2)))`, XLA's TPU emitter phase-decomposes the dilated
conv itself (the backward-input-conv path every strided conv uses), so
this is both the fastest and the leanest formulation measured on v5e at
the VAE's largest upsampler shape [28,256,256,256]->[28,512,512,256] bf16:

    literal nearest+conv          80.8 ms/call   (4x-inflated reads)
    4 phase convs + interleave    82.5 ms/call   (interleave layout copies
                                                 OOM the batch-4 decode)
    single lhs-dilated conv       44.6 ms/call   <- this module

Exactness vs the literal composition (up to float reassociation) is
asserted in tests/test_phase_upsample.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# rows of the 3x3 kernel contributing to each of the 4 transposed-conv
# taps (per axis): tap a multiplies x[i] for out row 2i+py with the kernel
# rows that alias there (module docstring; derived/checked in 1-D)
_GROUPS = ((0,), (0, 1), (1, 2), (2,))


def upsample_conv_kernel(w3: jax.Array) -> jax.Array:
    """[3,3,Cin,Cout] 'same'-conv kernel -> the [4,4,Cin,Cout] stride-2
    transposed-conv kernel of (nearest2x then conv w3)."""
    return jnp.stack([
        jnp.stack([sum(w3[ky, kx] for ky in _GROUPS[a] for kx in _GROUPS[b])
                   for b in range(4)])
        for a in range(4)])


def upsample2x_conv3x3(x: jax.Array, kernel: jax.Array,
                       bias: jax.Array | None = None) -> jax.Array:
    """nearest_upsample_2x(x) then 'same' 3x3 conv, computed exactly as a
    single stride-2 transposed convolution (no inflated intermediate).

    x: [B, H, W, Cin] NHWC; kernel: [3, 3, Cin, Cout] (flax nn.Conv layout);
    bias: [Cout] or None. Returns [B, 2H, 2W, Cout].
    """
    k4 = upsample_conv_kernel(kernel).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, k4.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, k4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=dn,
        preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
