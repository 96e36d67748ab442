"""Fused GEGLU kernel parity tests (interpreter mode on CPU).

The Pallas kernel (ops/geglu.py) is the custom_vjp PRIMAL of the GEGLU
projection; under AD the plain XLA formulation runs instead, so gradients
must be BIT-equal to the plain path and the primal equal within matmul
association tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from stablemtl_tpu.ops.geglu import _pick_blocks, _plain_geglu, geglu_proj


def _args(rng, rows, c, f, dtype):
    x = jnp.asarray(rng.randn(rows, c), dtype)
    kernel = jnp.asarray(rng.randn(c, 2 * f) * 0.05, dtype)
    bias = jnp.asarray(rng.randn(2 * f) * 0.1, dtype)
    return x, kernel, bias


def test_pick_blocks_production_shapes():
    # stage 0/1/2 production shapes all get a tiling under the budget
    assert _pick_blocks(16384, 320, 1280, 2) is not None
    assert _pick_blocks(4096, 640, 2560, 2) is not None
    assert _pick_blocks(1024, 1280, 5120, 2) is not None
    # degenerate F with no 128-multiple divisor
    assert _pick_blocks(64, 8, 8, 2) is None


@pytest.mark.parametrize("fast_gelu", [False, True])
@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 1e-5),
                                        (jnp.bfloat16, 2e-2)])
def test_fused_matches_plain(fast_gelu, dtype, atol):
    rng = np.random.RandomState(0)
    rows, c, f = 256, 320, 1280  # stage-0 channel geometry
    x, kernel, bias = _args(rng, rows, c, f, dtype)
    ref = geglu_proj(x, kernel, bias, fast_gelu=fast_gelu, use_fused=False)
    with pltpu.force_tpu_interpret_mode():
        out = geglu_proj(x, kernel, bias, fast_gelu=fast_gelu,
                         use_fused=True)
    assert out.dtype == dtype
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=atol, rtol=atol)


def test_fused_matches_module_path():
    """geglu_proj plain math == the (split-after-concat-dot) module form."""
    rng = np.random.RandomState(1)
    rows, c, f = 64, 320, 1280
    x, kernel, bias = _args(rng, rows, c, f, jnp.float32)
    h = x @ kernel + bias
    hh, gate = jnp.split(h, 2, axis=-1)
    ref = hh * jax.nn.gelu(gate, approximate=False)
    out = geglu_proj(x, kernel, bias, fast_gelu=False, use_fused=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_gradients_bit_equal_to_plain():
    """Under AD the custom_vjp runs the plain forward, so grads are the
    plain path's exactly (not a re-derived kernel backward)."""
    rng = np.random.RandomState(2)
    rows, c, f = 64, 128, 256
    x, kernel, bias = _args(rng, rows, c, f, jnp.float32)

    def loss(fn):
        def inner(x, kernel, bias):
            return (fn(x, kernel, bias) ** 2).sum()
        return inner

    fused = lambda x, k, b: geglu_proj(x, k, b, use_fused=True)
    plain = lambda x, k, b: geglu_proj(x, k, b, use_fused=False)
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss(fused), argnums=(0, 1, 2))(x, kernel, bias)
    g2 = jax.grad(loss(plain), argnums=(0, 1, 2))(x, kernel, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_under_vmap():
    """The pipeline calls the FF inside task-vmapped UNet streams."""
    rng = np.random.RandomState(3)
    t, rows, c, f = 3, 64, 128, 256
    x = jnp.asarray(rng.randn(t, rows, c), jnp.float32)
    kernel = jnp.asarray(rng.randn(c, 2 * f) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(2 * f) * 0.1, jnp.float32)
    ref = jax.vmap(lambda xi: geglu_proj(xi, kernel, bias,
                                         use_fused=False))(x)
    with pltpu.force_tpu_interpret_mode():
        out = jax.vmap(lambda xi: geglu_proj(xi, kernel, bias,
                                             use_fused=True))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_unsupported_shape_forced_fused_raises():
    """F not a multiple of 128 + use_fused=True -> loud ValueError, so an
    A/B bench can never silently time plain-vs-plain (ADVICE r4)."""
    rng = np.random.RandomState(4)
    x, kernel, bias = _args(rng, 16, 24, 24, jnp.float32)
    with pytest.raises(ValueError, match="no Pallas block fit"):
        geglu_proj(x, kernel, bias, use_fused=True)


def test_unsupported_shape_auto_falls_back():
    """F not a multiple of 128 under auto selection -> plain path."""
    rng = np.random.RandomState(4)
    x, kernel, bias = _args(rng, 16, 24, 24, jnp.float32)
    out = geglu_proj(x, kernel, bias, use_fused=None)
    ref = _plain_geglu(x, kernel[:, :24], kernel[:, 24:],
                       bias[:24], bias[24:], fast_gelu=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_module_tree_unchanged():
    """net_0/proj/{kernel,bias} param path and shapes survive the module
    rewrite (checkpoint + TP policy compatibility)."""
    from stablemtl_tpu.models.layers import FeedForward

    ff = FeedForward(dim=32, dtype=jnp.float32)
    params = ff.init(jax.random.PRNGKey(0), jnp.ones((2, 5, 32)))["params"]
    assert set(params.keys()) == {"net_0", "net_2"}
    assert params["net_0"]["proj"]["kernel"].shape == (32, 256)
    assert params["net_0"]["proj"]["bias"].shape == (256,)
    y = ff.apply({"params": params}, jnp.ones((2, 5, 32)))
    assert y.shape == (2, 5, 32)
