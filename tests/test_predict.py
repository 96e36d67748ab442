"""User-facing Predictor API (predict.py — reference pipeline __call__
equivalent, stablemtl_pipeline.py:177-368)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablemtl_tpu.factory import class_colors
from stablemtl_tpu.models import AutoencoderKL, UNet2DConditionModel
from stablemtl_tpu.models.unet import tiny_unet_config
from stablemtl_tpu.models.vae import tiny_vae_config
from stablemtl_tpu.pipeline import N_TASKS, TASKS, StableMTLPipeline
from stablemtl_tpu.predict import Predictor


@pytest.fixture(scope="module")
def predictor():
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    vae = AutoencoderKL(tiny_vae_config())
    vae_params = vae.init(k[0], jnp.zeros((1, 16, 16, 3)))
    text = jnp.zeros((1, 4, 32))
    child = UNet2DConditionModel(tiny_unet_config(cross_attention_dim=32))
    x12 = jnp.zeros((1, 2, 2, 12))
    t0 = jnp.zeros((1,), jnp.int32)
    child_params = child.init(k[3], x12, t0, text)
    _, taps = child.apply(child_params, x12, t0, text,
                          tap="afterSelfAttn_residual")
    feats = [jnp.zeros((N_TASKS - 1,) + tp.shape) for tp in taps]
    unet = UNet2DConditionModel(tiny_unet_config(
        cross_attention_dim=32, use_task_attention=True))
    unet_params = unet.init(k[1], x12, t0, text, task_feats=feats,
                            main_idx=jnp.asarray(0),
                            aux_idx=jnp.arange(1, N_TASKS))
    pipe = StableMTLPipeline(
        vae=vae, unet=unet, vae_params=vae_params, unet_params=unet_params,
        text_embed_table=jax.random.normal(k[2], (N_TASKS, 4, 32)) * 0.02,
        unet_child=child, unet_child_params=child_params)
    return Predictor(pipe, class_colors=class_colors())


def test_single_task_predictions(predictor):
    img = (np.random.RandomState(0).rand(24, 32, 3) * 255).astype(np.uint8)
    for task, channels in (("depth", None), ("normal", 3),
                           ("optical_flow", 2), ("semantic", None)):
        p = predictor(img, task)
        assert p.task == task
        assert p.output.shape[:2] == (24, 32)  # matched input res
        if channels:
            assert p.output.shape[-1] == channels
        assert p.visualization.dtype == np.uint8
        assert p.visualization.shape[:2] == (24, 32)
    # depth/shading are single-channel maps in [0, 1]
    d = predictor(img, "depth").output
    assert d.shape[-1] == 1 and d.min() >= 0 and d.max() <= 1
    # normals are unit vectors
    n = predictor(img, "normal").output
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_all_tasks_matches_single(predictor):
    img = (np.random.RandomState(1).rand(16, 16, 3) * 255).astype(np.uint8)
    allp = predictor.all_tasks(img)
    assert set(allp) == set(TASKS)
    for task in ("depth", "optical_flow"):
        single = predictor(img, task)
        np.testing.assert_allclose(allp[task].output, single.output,
                                   atol=2e-2)
        assert np.mean(np.abs(allp[task].output.astype(np.float64)
                              - single.output)) < 2e-3


def test_two_frame_input(predictor):
    r = np.random.RandomState(2)
    a = (r.rand(16, 16, 3) * 255).astype(np.uint8)
    b = (r.rand(16, 16, 3) * 255).astype(np.uint8)
    flow_static = predictor(a, "optical_flow", next_image=a).output
    flow_moving = predictor(a, "optical_flow", next_image=b).output
    assert flow_static.shape == flow_moving.shape
    assert not np.allclose(flow_static, flow_moving)
