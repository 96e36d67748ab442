"""End-to-end raw-SD2 ingestion: a 4-channel-conv_in UNet checkpoint loaded
into the 12-channel model through factory.load_pretrained (VERDICT round-1
item 1 / ADVICE high #1).

The inflation contract (reference util/model.py:11-27 _replace_unet_conv_in):
the 4-ch conv_in kernel is tiled 3x over input channels and scaled by 1/3,
so a 12-ch input made of three copies of the same 4-ch latent produces
EXACTLY the output of the original 4-ch model — verified here on the full
UNet forward, not just the kernel arrays.
"""

import os

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablemtl_tpu.factory import init_params, load_pretrained
from stablemtl_tpu.models import UNet2DConditionModel
from stablemtl_tpu.models.unet import tiny_unet_config
from stablemtl_tpu.models.vae import AutoencoderKL, tiny_vae_config


def _save_npz(variables, path):
    """Write the npz layout tools/convert_sd2.py produces."""
    flat = flax.traverse_util.flatten_dict(variables)
    np.savez(path, **{"/".join(map(str, k)): np.asarray(v)
                      for k, v in flat.items()})


@pytest.fixture(scope="module")
def sd2_dir(tmp_path_factory):
    """Synthetic 'converted raw SD2' checkpoint dir: 4-ch UNet + VAE npz."""
    out = tmp_path_factory.mktemp("sd2_flax")
    k = jax.random.split(jax.random.PRNGKey(7), 2)
    src_unet = UNet2DConditionModel(tiny_unet_config(in_channels=4))
    src_params = init_params(src_unet, k[0], jnp.zeros((1, 8, 8, 4)),
                             jnp.zeros((1,), jnp.int32),
                             jnp.zeros((1, 5, 32)))
    # non-degenerate weights: init then perturb deterministically
    src_params = jax.tree.map(
        lambda a: a + 0.01 * jnp.sin(jnp.arange(a.size, dtype=jnp.float32)
                                     ).reshape(a.shape), src_params)
    _save_npz(src_params, out / "unet.npz")

    vae = AutoencoderKL(tiny_vae_config())
    vae_params = init_params(vae, k[1], jnp.zeros((1, 32, 32, 3)))
    _save_npz(vae_params, out / "vae.npz")
    np.save(out / "text_table.npy",
            np.random.default_rng(0).normal(size=(7, 5, 32))
            .astype(np.float32))
    return out, src_unet, src_params, vae_params


def test_load_pretrained_inflates_and_matches_source(sd2_dir, caplog):
    out, src_unet, src_params, src_vae = sd2_dir
    k = jax.random.split(jax.random.PRNGKey(1), 2)
    unet12 = UNet2DConditionModel(tiny_unet_config())  # in_channels=12
    init12 = init_params(unet12, k[0], jnp.zeros((1, 8, 8, 12)),
                         jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 32)))
    vae = AutoencoderKL(tiny_vae_config())
    vae_init = init_params(vae, k[1], jnp.zeros((1, 32, 32, 3)))

    vae_loaded, unet_loaded, _, table = load_pretrained(
        str(out), vae_init, init12, None, text_dim=32, strict=True)

    # conv_in: tiled 3x over input channels, scaled 1/3
    src_k = np.asarray(src_params["params"]["conv_in"]["kernel"])
    got_k = np.asarray(unet_loaded["params"]["conv_in"]["kernel"])
    assert got_k.shape[2] == 12
    np.testing.assert_allclose(got_k, np.tile(src_k, (1, 1, 3, 1)) / 3.0,
                               rtol=1e-6)

    # every other parameter is copied verbatim
    flat_src = flax.traverse_util.flatten_dict(src_params)
    flat_got = flax.traverse_util.flatten_dict(unet_loaded)
    assert set(flat_got) == set(flat_src)
    for kpath, v in flat_src.items():
        if kpath[-2] == "conv_in":
            continue
        np.testing.assert_array_equal(np.asarray(flat_got[kpath]),
                                      np.asarray(v), err_msg=str(kpath))
    for kpath, v in flax.traverse_util.flatten_dict(src_vae).items():
        np.testing.assert_array_equal(
            np.asarray(flax.traverse_util.flatten_dict(vae_loaded)[kpath]),
            np.asarray(v))
    assert table.shape == (7, 5, 32)

    # forward golden: 12-ch model on [x,x,x] == 4-ch source model on x
    rng = jax.random.PRNGKey(3)
    x4 = jax.random.normal(rng, (1, 8, 8, 4))
    t = jnp.asarray([999], jnp.int32)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (1, 5, 32))
    want, _ = src_unet.apply(src_params, x4, t, ctx)
    got, _ = unet12.apply(unet_loaded, jnp.tile(x4, (1, 1, 1, 3)), t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_load_pretrained_strict_raises_on_bad_shape(sd2_dir, tmp_path):
    out, _, src_params, _ = sd2_dir
    bad = tmp_path / "bad_ckpt"
    os.makedirs(bad)
    flat = {"/".join(map(str, k)): np.asarray(v) for k, v in
            flax.traverse_util.flatten_dict(src_params).items()}
    key = "params/time_embedding/linear_1/kernel"
    assert key in flat
    flat[key] = flat[key][:, :-1]  # corrupt a shape
    np.savez(bad / "unet.npz", **flat)

    k = jax.random.PRNGKey(1)
    unet12 = UNet2DConditionModel(tiny_unet_config())
    init12 = init_params(unet12, k, jnp.zeros((1, 8, 8, 12)),
                         jnp.zeros((1,), jnp.int32), jnp.zeros((1, 5, 32)))
    with pytest.raises(ValueError, match="time_embedding"):
        load_pretrained(str(bad), init12, init12, None, text_dim=32,
                        strict=True)


def test_load_pretrained_multistream_child_shares_unet(sd2_dir):
    """Without a unet_child.npz the child loads from unet.npz (the reference
    initializes the frozen child from the same single-stream checkpoint,
    util/model.py:201-223) — including conv_in inflation."""
    out, _, src_params, _ = sd2_dir
    cfg = tiny_unet_config(use_task_attention=True)
    unet = UNet2DConditionModel(cfg)
    child = UNet2DConditionModel(tiny_unet_config())
    k = jax.random.split(jax.random.PRNGKey(2), 3)
    x12 = jnp.zeros((1, 8, 8, 12))
    t0 = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 5, 32))
    child_init = init_params(child, k[0], x12, t0, ctx)
    _, taps = child.apply(child_init, x12, t0, ctx,
                          tap="afterSelfAttn_residual")
    feats = [jnp.zeros((6,) + tp.shape) for tp in taps]
    unet_init = init_params(unet, k[1], x12, t0, ctx, task_feats=feats,
                            main_idx=jnp.asarray(0),
                            aux_idx=jnp.arange(1, 7))
    vae = AutoencoderKL(tiny_vae_config())
    vae_init = init_params(vae, k[2], jnp.zeros((1, 32, 32, 3)))

    # strict must NOT trip on the fresh task_attn banks (absent in raw SD2)
    _, unet_loaded, child_loaded, _ = load_pretrained(
        str(out), vae_init, unet_init, child_init, text_dim=32, strict=True)
    src_k = np.asarray(src_params["params"]["conv_in"]["kernel"])
    for loaded in (unet_loaded, child_loaded):
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["conv_in"]["kernel"]),
            np.tile(src_k, (1, 1, 3, 1)) / 3.0, rtol=1e-6)
