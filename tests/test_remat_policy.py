"""Transformer remat policy (UNetConfig.remat_transformer) semantics.

The knob must be a pure memory/scheduling lever: parameter structure,
forward outputs, and gradients are identical (up to recompute determinism,
which on CPU is bit-exact) across "none" / "full" / "dots"
(jax.checkpoint_policies.dots_saveable). Measured speed/memory A/B lives
in tools/bench_train512.py remat mode (BENCH_NOTES r5).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablemtl_tpu.models import UNet2DConditionModel
from stablemtl_tpu.models.unet import tiny_unet_config

N_TASKS = 7


def _build(remat_transformer: str):
    cfg = tiny_unet_config(use_task_attention=True,
                           remat_transformer=remat_transformer)
    unet = UNet2DConditionModel(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 12),
                    jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(
        2, 4, cfg.cross_attention_dim), jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    return unet, params, (x, t, ctx)


@pytest.mark.parametrize("variant", ["full", "dots"])
def test_remat_transformer_matches_none(variant):
    unet0, params0, args = _build("none")
    unet1, params1, _ = _build(variant)

    # identical parameter structure and values (nn.remat preserves names)
    flat0 = jax.tree_util.tree_leaves_with_path(params0)
    flat1 = jax.tree_util.tree_leaves_with_path(params1)
    assert [p for p, _ in flat0] == [p for p, _ in flat1]
    for (_, a), (_, b) in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out0, _ = unet0.apply(params0, *args)
    out1, _ = unet1.apply(params1, *args)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))

    def loss(unet, p):
        return unet.apply(p, *args)[0].astype(jnp.float32).mean()

    g0 = jax.grad(lambda p: loss(unet0, p))(params0)
    g1 = jax.grad(lambda p: loss(unet1, p))(params1)
    for (_, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                              jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_transformer_config_threads_through_factory():
    from stablemtl_tpu.factory import model_configs

    ucfg, ccfg, _, _ = model_configs("tiny", True, {},
                                     remat_transformer="dots")
    assert ucfg.remat_transformer == "dots"
    # the frozen child never differentiates — no remat needed there
    assert ccfg.remat_transformer == "none"
