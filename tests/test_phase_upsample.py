"""Exactness of the phase-decomposed upsample+conv (ops/phase_upsample.py)
against the literal nearest-2x + 3x3 'same' conv composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablemtl_tpu.models.layers import nearest_upsample_2x
from stablemtl_tpu.ops.phase_upsample import upsample2x_conv3x3


def _reference(x, kernel, bias):
    up = nearest_upsample_2x(x)
    dn = jax.lax.conv_dimension_numbers(up.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(up, kernel, (1, 1),
                                     ((1, 1), (1, 1)),
                                     dimension_numbers=dn)
    return y + bias


@pytest.mark.parametrize("h,w,cin,cout", [(5, 7, 3, 4), (8, 8, 16, 16),
                                          (1, 1, 2, 3)])
def test_phase_upsample_exact(h, w, cin, cout):
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k[0], (2, h, w, cin))
    kernel = jax.random.normal(k[1], (3, 3, cin, cout))
    bias = jax.random.normal(k[2], (cout,))
    want = np.asarray(_reference(x, kernel, bias))
    got = np.asarray(upsample2x_conv3x3(x, kernel, bias))
    assert got.shape == (2, 2 * h, 2 * w, cout)
    # taps summed in the kernel before the multiply vs after: pure float
    # reassociation, ~1e-5 on O(10) magnitudes
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_phase_upsample_gradients_match():
    k = jax.random.split(jax.random.PRNGKey(1), 2)
    x = jax.random.normal(k[0], (1, 4, 6, 8))
    kernel = jax.random.normal(k[1], (3, 3, 8, 8))
    bias = jnp.zeros((8,))

    def loss_ref(args):
        return (_reference(*args) ** 2).sum()

    def loss_fast(args):
        return (upsample2x_conv3x3(*args) ** 2).sum()

    g_ref = jax.grad(loss_ref)((x, kernel, bias))
    g_fast = jax.grad(loss_fast)((x, kernel, bias))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fast)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-3)
