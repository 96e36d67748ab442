"""Phase-decomposed nearest-2x-upsample + 3x3 conv (exact, 4/9 the FLOPs).

The reference composes nearest-neighbor 2x upsampling with a 3x3 'same'
conv (Upsample3D, resnet.py:21-73; diffusers VAE decoder upsamplers). On
the high-res grid every output pixel's 3x3 window covers at most 2x2
DISTINCT low-res pixels (duplicated by the nearest upsample), so the
operation is exactly equal to four 2x2 convolutions on the LOW-res input —
one per output phase (parity of the output row/col) — interleaved back:

    out[2i+py, 2j+px] = sum_{a,b in {0,1}} K[py,px][a,b] . x[i+oy+a, j+ox+b]

with phase kernels formed by summing the 3x3 taps that alias to the same
low-res pixel:

    rows(py=0) = {0}, {1,2}    rows(py=1) = {0,1}, {2}
    (and identically for columns)

MAC count: 4 . HW . 4 . C^2 = 16 HW C^2 vs the direct 4HW . 9 . C^2 =
36 HW C^2 -> 2.25x fewer FLOPs, and the convs read the low-res tensor
instead of the 4x-inflated one. Exactness (up to float reassociation) is
asserted in tests/test_phase_upsample.py against the literal composition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# tap groups per phase: which 3x3 kernel rows collapse onto the window's
# first / second low-res row (see module docstring)
_GROUPS = {0: ((0,), (1, 2)), 1: ((0, 1), (2,))}
# zero-padding of the low-res input per phase: phase 0 reads x[i-1..i]
# (pad 1 before), phase 1 reads x[i..i+1] (pad 1 after)
_PAD = {0: (1, 0), 1: (0, 1)}


def _phase_kernel(w3: jax.Array, py: int, px: int) -> jax.Array:
    """[3,3,Cin,Cout] -> the [2,2,Cin,Cout] kernel of phase (py, px)."""
    rows, cols = _GROUPS[py], _GROUPS[px]
    out = jnp.stack([
        jnp.stack([sum(w3[ky, kx] for ky in rows[a] for kx in cols[b])
                   for b in range(2)])
        for a in range(2)])
    return out  # [2, 2, Cin, Cout]


def upsample2x_conv3x3(x: jax.Array, kernel: jax.Array,
                       bias: jax.Array | None = None) -> jax.Array:
    """nearest_upsample_2x(x) then 'same' 3x3 conv — computed exactly via
    four 2x2 phase convolutions on the low-res input.

    x: [B, H, W, Cin] NHWC; kernel: [3, 3, Cin, Cout] (flax nn.Conv layout);
    bias: [Cout] or None. Returns [B, 2H, 2W, Cout].
    """
    B, H, W, _ = x.shape
    cout = kernel.shape[-1]
    dn = jax.lax.conv_dimension_numbers(x.shape, (2, 2, x.shape[-1], cout),
                                        ("NHWC", "HWIO", "NHWC"))
    phases = []
    for py in range(2):
        row = []
        for px in range(2):
            k = _phase_kernel(kernel, py, px).astype(x.dtype)
            row.append(jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1),
                padding=(_PAD[py], _PAD[px]), dimension_numbers=dn,
                preferred_element_type=x.dtype))
        phases.append(row)
    # interleave: out[:, 2i+py, 2j+px] = phases[py][px][:, i, j]
    y = jnp.stack([jnp.stack(row, axis=0) for row in phases], axis=0)
    y = y.transpose(2, 3, 0, 4, 1, 5)          # [B, H, 2, W, 2, Cout]
    y = y.reshape(B, 2 * H, 2 * W, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
