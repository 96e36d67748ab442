"""Performance-path correctness: bf16 compute, remat, shape buckets."""

import jax
import jax.numpy as jnp
import numpy as np

from stablemtl_tpu.models import AutoencoderKL, UNet2DConditionModel
from stablemtl_tpu.models.unet import tiny_unet_config
from stablemtl_tpu.models.vae import tiny_vae_config
from stablemtl_tpu.pipeline import N_TASKS, StableMTLPipeline
from stablemtl_tpu.train_state import (
    OptimizerConfig,
    create_train_state,
    make_train_step,
)


def _pipeline(dtype="float32", remat=False, key=0):
    k = jax.random.split(jax.random.PRNGKey(key), 3)
    vae = AutoencoderKL(tiny_vae_config(dtype=dtype))
    vae_params = vae.init(k[0], jnp.zeros((1, 16, 16, 3)))
    ucfg = tiny_unet_config(cross_attention_dim=32, dtype=dtype, remat=remat)
    unet = UNet2DConditionModel(ucfg)
    text = jnp.zeros((1, 4, 32))
    unet_params = unet.init(k[1], jnp.zeros((1, 2, 2, 12)),
                            jnp.zeros((1,), jnp.int32), text)
    return StableMTLPipeline(
        vae=vae, unet=unet, vae_params=vae_params, unet_params=unet_params,
        text_embed_table=jax.random.normal(k[2], (N_TASKS, 4, 32)) * 0.02)


def _batch(H=16, W=16, B=2, task=1, seed=0):
    r = np.random.RandomState(seed)
    rgb = r.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    return {"rgb_norm": rgb, "rgb_next_norm": rgb,
            "target_3ch": r.uniform(-1, 1, (B, H, W, 3)).astype(np.float32),
            "valid_mask": np.ones((B, H, W, 1), bool),
            "task_idx": np.asarray(task, np.int32)}


def test_bf16_train_step_descends():
    pipe = _pipeline(dtype="bfloat16")
    state = create_train_state(pipe.unet_params,
                               OptimizerConfig(lr=1e-3, use_schedule=False))
    step = make_train_step(pipe, donate=False)
    losses = []
    for i in range(4):
        state, m = step(state, _batch(seed=0))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    # params stay f32 (mixed precision: bf16 compute, f32 master weights)
    assert jax.tree_util.tree_leaves(state.params)[0].dtype == jnp.float32


def test_remat_matches_no_remat():
    p1 = _pipeline(remat=False, key=0)
    p2 = _pipeline(remat=True, key=0)
    # same init => same params
    for a, b in zip(jax.tree_util.tree_leaves(p1.unet_params),
                    jax.tree_util.tree_leaves(p2.unet_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # compare GRADIENTS (pre-optimizer): remat must be numerically
    # equivalent up to float reassociation. (Post-Adam params are unstable
    # for near-zero grads — eps-normalization amplifies 1e-7 grad diffs.)
    b = _batch()

    def grads_of(pipe):
        from stablemtl_tpu.train_state import (downsample_valid_mask,
                                               frozen_params_of,
                                               _bind_frozen)
        from stablemtl_tpu.utils.loss import masked_mean

        def loss_fn(params):
            p = _bind_frozen(pipe, frozen_params_of(pipe))
            stacked = jnp.concatenate(
                [b["rgb_norm"], b["rgb_next_norm"], b["target_3ch"]], axis=0)
            lat, lat_next, gt = jnp.split(
                jax.lax.stop_gradient(p.encode_rgb(stacked)), 3, axis=0)
            pred = p.unet_forward(lat, lat_next, b["task_idx"],
                                  params=params, train=True)
            mask = downsample_valid_mask(jnp.asarray(b["valid_mask"]))
            return masked_mean((pred - gt) ** 2,
                               jnp.broadcast_to(mask, pred.shape))

        return jax.grad(loss_fn)(pipe.unet_params)

    g1 = grads_of(p1)
    g2 = grads_of(p2)
    for a, c in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4,
                                   rtol=2e-3)


def test_shape_buckets_coexist():
    """Two input geometries share one train-step callable (one compiled
    executable per bucket, SURVEY.md §7 variable-geometry plan)."""
    pipe = _pipeline()
    state = create_train_state(pipe.unet_params,
                               OptimizerConfig(use_schedule=False))
    step = make_train_step(pipe, donate=False)
    state, m1 = step(state, _batch(H=16, W=16))
    state, m2 = step(state, _batch(H=16, W=24, seed=1))
    state, m3 = step(state, _batch(H=16, W=16, seed=2))
    for m in (m1, m2, m3):
        assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 3


def test_skip_nonfinite_updates():
    """A NaN batch must not poison the params when the guard is on."""
    pipe = _pipeline()
    state = create_train_state(
        pipe.unet_params,
        OptimizerConfig(lr=1e-3, use_schedule=False,
                        skip_nonfinite_updates=3))
    step = make_train_step(pipe, donate=False)
    state, m = step(state, _batch(seed=0))
    p_before = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    bad = _batch(seed=1)
    bad["rgb_norm"][0, 0, 0, 0] = np.nan
    state, m = step(state, bad)
    p_after = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.testing.assert_array_equal(p_before, p_after)  # update skipped
    # training continues on good batches
    state, m = step(state, _batch(seed=2))
    assert np.isfinite(float(m["loss"]))
