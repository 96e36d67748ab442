"""Model-stack tests (tiny configs; CPU is 1-core so fixtures are shared)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stablemtl_tpu.models.unet import (
    UNet2DConditionModel,
    inflate_conv_in,
    task_feat_shapes,
    tiny_unet_config,
)
from stablemtl_tpu.models.vae import AutoencoderKL, tiny_vae_config
from stablemtl_tpu.models.clip import (
    CLIPTextModel,
    HashTokenizer,
    tiny_clip_config,
    tokenize_batch,
)

RNG = jax.random.PRNGKey(0)
H = W = 16


@pytest.fixture(scope="module")
def unet_setup():
    cfg = tiny_unet_config(use_task_attention=True, n_tasks=7,
                           attn_mask_ratio=0.0)
    unet = UNet2DConditionModel(cfg)
    x = jax.random.normal(RNG, (1, H, W, 12))
    ctx = jax.random.normal(RNG, (1, 4, cfg.cross_attention_dim))
    dummy_feats = [jnp.zeros((6, 1, n, c)) for n, c in
                   task_feat_shapes(cfg, H, W)]
    params = unet.init({"params": RNG}, x, 999, ctx, dummy_feats,
                       jnp.asarray(0), jnp.asarray([1, 2, 3, 4, 5, 6]))
    return cfg, unet, x, ctx, params


def test_unet_shapes_and_taps(unet_setup):
    cfg, unet, x, ctx, params = unet_setup
    out, taps = unet.apply(params, x, 999, ctx, tap="afterSelfAttn_residual")
    assert out.shape == (1, H, W, 4)
    assert len(taps) == 16
    ch = cfg.block_out_channels
    heads = cfg.attention_heads
    inner = [ch[i] // heads[i] * heads[i] for i in range(4)]
    expected_dims = ([inner[0]] * 2 + [inner[1]] * 2 + [inner[2]] * 2
                     + [inner[3]] + [inner[3]] * 3 + [inner[2]] * 3
                     + [inner[0]] * 3)
    # reference layer_dims pattern (util/model.py:67-84) scaled to tiny cfg
    got_dims = [t.shape[-1] for t in taps]
    assert got_dims[:7] == expected_dims[:7]
    assert got_dims[13:] == expected_dims[13:]
    # token counts follow resolutions 16x16 down to 2x2 back up
    assert taps[0].shape[1] == H * W
    assert taps[6].shape[1] == (H // 8) * (W // 8)


def test_task_attention_zero_init_is_identity(unet_setup):
    """With zero-initialized to_out_task the multi-stream forward must equal
    the task-free forward exactly (reference util/model.py:140-146 rationale)."""
    cfg, unet, x, ctx, params = unet_setup
    out_a, taps = unet.apply(params, x, 999, ctx, tap="afterSelfAttn_residual")
    task_feats = [jnp.broadcast_to(t, (6,) + t.shape) for t in taps]
    out_b, _ = unet.apply(params, x, 999, ctx, task_feats,
                          jnp.asarray(1), jnp.asarray([0, 2, 3, 4, 5, 6]))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-6)


def test_task_masking_changes_nothing_when_out_proj_zero(unet_setup):
    """Masking only perturbs the task-attention branch; with zero out-proj the
    final output stays identical — but the rng stream must be consumed."""
    cfg, unet, x, ctx, params = unet_setup
    cfg2 = tiny_unet_config(use_task_attention=True, n_tasks=7,
                            attn_mask_ratio=1.0)
    unet2 = UNet2DConditionModel(cfg2)
    _, taps = unet.apply(params, x, 999, ctx, tap="afterSelfAttn_residual")
    task_feats = [jnp.broadcast_to(t, (6,) + t.shape) for t in taps]
    out, _ = unet2.apply(params, x, 999, ctx, task_feats,
                         jnp.asarray(0), jnp.asarray([1, 2, 3, 4, 5, 6]),
                         train=True, rngs={"taskmask": jax.random.PRNGKey(7)})
    assert np.isfinite(np.asarray(out)).all()


def test_attention_layer_names_match_param_tree(unet_setup):
    """The 16-layer traversal order that task_kv_tables relies on must
    name real modules carrying task_attn banks (guards against naming
    drift between __call__ and the precompute path)."""
    from stablemtl_tpu.models.unet import attention_layer_names

    cfg, unet, x, ctx, params = unet_setup
    names = attention_layer_names(cfg)
    assert len(names) == cfg.num_attn_layers == 16
    p = params["params"]
    for name in names:
        assert name in p, name
        assert "task_attn" in p[name]["transformer_blocks_0"], name


def test_inflate_conv_in_duplicate_invariance():
    """Inflated conv on a 3x-duplicated input == base conv on the input
    (reference util/model.py:11-27 repeat/scale rule)."""
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 4, 8)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)), jnp.float32)

    inflated = inflate_conv_in({"kernel": kernel, "bias": bias}, repeat=3)
    assert inflated["kernel"].shape == (3, 3, 12, 8)

    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    base = jax.lax.conv_general_dilated(x, kernel, (1, 1), "SAME",
                                        dimension_numbers=dn) + bias
    x3 = jnp.concatenate([x, x, x], axis=-1)
    dn3 = jax.lax.conv_dimension_numbers(x3.shape, inflated["kernel"].shape,
                                         ("NHWC", "HWIO", "NHWC"))
    infl = jax.lax.conv_general_dilated(x3, inflated["kernel"], (1, 1), "SAME",
                                        dimension_numbers=dn3) + bias
    np.testing.assert_allclose(np.asarray(base), np.asarray(infl), atol=1e-5)


def test_vae_roundtrip_shapes():
    cfg = tiny_vae_config()
    vae = AutoencoderKL(cfg)
    img = jax.random.normal(RNG, (2, 32, 32, 3))
    params = vae.init(RNG, img)
    lat = vae.apply(params, img, method=AutoencoderKL.encode)
    assert lat.shape == (2, 4, 4, 4)  # 8x spatial downsample, 4 latent ch
    dec = vae.apply(params, lat, method=AutoencoderKL.decode)
    assert dec.shape == (2, 32, 32, 3)


def test_clip_text_model_and_tokenizer():
    cfg = tiny_clip_config()
    model = CLIPTextModel(cfg)
    tok = HashTokenizer()
    prompts = ["depth", "optical flow", "scene flow"]
    ids = tokenize_batch(tok, prompts)
    assert ids.shape[0] == 3 and ids.shape[1] == 4  # bos + 2 words + eos
    # single-word prompts are bos + tok + eos padded with eos
    params = model.init(RNG, jnp.asarray(ids))
    emb = model.apply(params, jnp.asarray(ids))
    assert emb.shape == (3, 4, cfg.hidden_size)
    # embeddings differ across distinct prompts
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[1]))
    # deterministic tokenization
    np.testing.assert_array_equal(ids, tokenize_batch(tok, prompts))


def test_irregular_upsample_matches_torch_nearest():
    """Odd-geometry up path: torch F.interpolate(mode='nearest') maps
    output row i -> floor(i*in/out); jax.image.resize would pick different
    rows (half-pixel centers). Compare the full Upsample layer against a
    torch twin on a non-integer ratio (3x4 -> 5x7)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from stablemtl_tpu.models.layers import Upsample

    rng = np.random.RandomState(0)
    x = rng.standard_normal((1, 3, 4, 2)).astype(np.float32)
    up = Upsample(channels=2)
    params = up.init(jax.random.PRNGKey(0), jnp.asarray(x),
                     output_size=(5, 7))
    got = np.asarray(up.apply(params, jnp.asarray(x), output_size=(5, 7)))

    k = np.asarray(params["params"]["conv"]["kernel"])  # [3,3,I,O]
    b = np.asarray(params["params"]["conv"]["bias"])
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tx = F.interpolate(tx, size=(5, 7), mode="nearest")
    ty = F.conv2d(tx, torch.from_numpy(k.transpose(3, 2, 0, 1)),
                  torch.from_numpy(b), padding=1)
    want = ty.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_task_feat_shapes_odd_geometry():
    """Stride-2 downsamples produce ceil(x/2); the tap-shape helper must
    report the ACTUAL token counts for odd latent sizes."""
    cfg = tiny_unet_config()
    child = UNet2DConditionModel(cfg)
    H, W = 9, 12
    text = jnp.zeros((1, 4, cfg.cross_attention_dim))
    _, taps = jax.eval_shape(
        lambda r: child.init_with_output(
            r, jnp.zeros((1, H, W, 12)), jnp.zeros((1,), jnp.int32), text,
            tap="afterSelfAttn_residual")[0],
        jax.random.PRNGKey(0))
    want = task_feat_shapes(cfg, H, W)
    got = [(t.shape[1], t.shape[2]) for t in taps]
    assert got == want


def test_clip_pretokenization_matches_reference_pattern():
    """CLIP splits digits individually and groups non-letter runs (incl.
    '_'); a naive \\w+ regex silently tokenizes differently."""
    from stablemtl_tpu.models.clip import PRETOKEN_PAT

    cases = {
        "512": ["5", "1", "2"],
        "optical_flow": ["optical", "_", "flow"],
        "a!!b": ["a", "!!", "b"],
        "it's 4k!": ["it", "'s", "4", "k", "!"],
        "<|endoftext|>": ["<|endoftext|>"],
    }
    for text, want in cases.items():
        assert PRETOKEN_PAT.findall(text) == want, text


def test_random_mask_strategy_never_targets_excluded_key():
    """task_kv layout: the key axis spans ALL tasks with the main task
    -inf-excluded. 'random' masking must pick among REAL keys only —
    targeting the excluded key would be a silent no-op (output equal to
    the unmasked forward)."""
    from stablemtl_tpu.models.transformer import TaskAttentionBank

    T, B, N, C = 3, 1, 4, 8
    bank = TaskAttentionBank(dim=C, n_tasks=T, n_attns=2,
                             attn_mask_ratio=1.0, attn_mask_type="random")
    rng = np.random.RandomState(0)
    hid = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    kv = (jnp.asarray(rng.standard_normal((T, B, N, C)), jnp.float32),
          jnp.asarray(rng.standard_normal((T, B, N, C)), jnp.float32))
    key_bias = jnp.where(jnp.arange(T) == 0, -1e9, 0.0)
    params = bank.init(jax.random.PRNGKey(0), hid, None, jnp.asarray(0),
                       None, task_kv=kv, task_key_bias=key_bias)
    # non-zero out proj so masking is visible in the output
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape) * 0.1,
                              p.dtype), params)

    def run(train, seed):
        return np.asarray(bank.apply(
            params, hid, None, jnp.asarray(0), None, task_kv=kv,
            task_key_bias=key_bias, train=train,
            rngs={"taskmask": jax.random.PRNGKey(seed)} if train else None))

    unmasked = run(False, 0)
    for seed in range(24):
        out = run(True, seed)
        # attn_mask_ratio=1.0: some REAL key is always masked, so the
        # output must never collapse to the unmasked forward
        assert np.abs(out - unmasked).max() > 1e-7, seed


@pytest.mark.parametrize("use_kv_path", [True, False])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_taskattn_bmr_matches_einsum(monkeypatch, use_kv_path, dtype):
    """STABLEMTL_TASKATTN_BMR reassociates the task-axis attention einsums
    as broadcast-mul-reduce (VPU form, no MXU tile padding). Same math:
    outputs must agree with the dot_general form to f32-association
    tolerance on both the task_kv (shared tables + key bias) and the
    task_feats (gathered aux subset) paths."""
    from stablemtl_tpu.models.transformer import TaskAttentionBank

    T, B, N, C = 5, 2, 8, 16
    dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
    bank = TaskAttentionBank(dim=C, n_tasks=T, n_attns=4, dtype=dt)
    rng = np.random.RandomState(7)
    hid = jnp.asarray(rng.standard_normal((B, N, C)), dt)
    if use_kv_path:
        kv = (jnp.asarray(rng.standard_normal((T, B, N, C)), dt),
              jnp.asarray(rng.standard_normal((T, B, N, C)), dt))
        feats, aux, bias = None, None, jnp.where(
            jnp.arange(T) == 1, -1e9, 0.0).astype(jnp.float32)
    else:
        feats = jnp.asarray(rng.standard_normal((T - 1, B, N, C)), dt)
        aux = jnp.asarray([0, 2, 3, 4])
        kv, bias = None, None
    params = bank.init(jax.random.PRNGKey(0), hid, feats, jnp.asarray(1),
                       aux, task_kv=kv, task_key_bias=bias)
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape) * 0.05
                              ).astype(p.dtype), params)

    def run():
        # transformer.py reads the flag at TRACE time inside __call__
        return np.asarray(bank.apply(
            params, hid, feats, jnp.asarray(1), aux, task_kv=kv,
            task_key_bias=bias).astype(jnp.float32))

    monkeypatch.delenv("STABLEMTL_TASKATTN_BMR", raising=False)
    ref = run()
    monkeypatch.setenv("STABLEMTL_TASKATTN_BMR", "1")
    got = run()
    atol = 1e-5 if dtype == "float32" else 5e-2
    np.testing.assert_allclose(got, ref, atol=atol, rtol=atol)
