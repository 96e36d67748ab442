"""Activation parity of converted weights against independent PyTorch
implementations (VERDICT round-1 item 1).

The risky part of SD2 weight ingestion is layout conversion (OIHW->HWIO,
linear transposes, GN/LN naming) and op semantics (exact-erf gelu, GN eps).
These tests build torch modules from torch.nn / transformers primitives —
the same kernels diffusers composes — name their weights with the
diffusers key scheme, run them through torch_convert, and require the Flax
forward to match the torch forward to ~1e-5.

Reference anchors: resnet.py:110-204 (ResnetBlock3D), attention.py:114-380
(Transformer3DModel/BasicTransformerBlock), SD2 text tower (transformers
CLIPTextModel, util/model.py:205-210).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stablemtl_tpu.models.clip import CLIPTextConfig, CLIPTextModel  # noqa: E402
from stablemtl_tpu.models.layers import ResnetBlock  # noqa: E402
from stablemtl_tpu.models.torch_convert import (  # noqa: E402
    convert_clip_text_state_dict,
    convert_unet_state_dict,
)
from stablemtl_tpu.models.transformer import Transformer2D  # noqa: E402

ATOL = 2e-5


def _np_state_dict(mod: tnn.Module, prefix: str = "") -> dict:
    return {prefix + k: v.detach().numpy() for k, v in
            mod.state_dict().items()}


# ---------------------------------------------------------------------------
# ResnetBlock vs torch.nn GN/SiLU/Conv2d
# ---------------------------------------------------------------------------

class _TorchResnet(tnn.Module):
    """diffusers ResnetBlock2D semantics from torch.nn primitives."""

    def __init__(self, cin, cout, temb_dim, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_dim, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


@pytest.mark.parametrize("cin,cout", [(16, 16), (16, 32)])
def test_resnet_block_parity(cin, cout):
    torch.manual_seed(0)
    tm = _TorchResnet(cin, cout, temb_dim=24, groups=8).eval()
    sd = _np_state_dict(tm, "down_blocks.0.resnets.0.")
    params = convert_unet_state_dict(sd)["down_blocks_0_resnets_0"]

    x = torch.randn(2, cin, 8, 8)
    temb = torch.randn(2, 24)
    with torch.no_grad():
        want = tm(x, temb).numpy()

    fm = ResnetBlock(out_channels=cout, groups=8, eps=1e-5)
    got = fm.apply({"params": params},
                   jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                   jnp.asarray(temb.numpy()))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               atol=ATOL)


# ---------------------------------------------------------------------------
# Transformer2D (GN -> linear proj -> self-attn -> cross-attn -> GEGLU FF)
# ---------------------------------------------------------------------------

class _TorchAttention(tnn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_v = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        B, N, C = x.shape
        hd = C // self.heads

        def heads_first(t):
            return t.view(B, -1, self.heads, hd).transpose(1, 2)

        out = F.scaled_dot_product_attention(
            heads_first(self.to_q(x)), heads_first(self.to_k(ctx)),
            heads_first(self.to_v(ctx)))
        return self.to_out[0](out.transpose(1, 2).reshape(B, N, C))


class _TorchGEGLUFF(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        proj = tnn.Linear(dim, inner * 2)
        self.net = tnn.ModuleList([tnn.Module(), tnn.Identity(),
                                   tnn.Linear(inner, dim)])
        self.net[0].proj = proj

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class _TorchTransformer2D(tnn.Module):
    """diffusers Transformer2DModel with use_linear_projection=True."""

    def __init__(self, C, ctx_dim, heads):
        super().__init__()
        self.norm = tnn.GroupNorm(32, C, eps=1e-6)
        self.proj_in = tnn.Linear(C, C)
        blk = tnn.Module()
        blk.norm1 = tnn.LayerNorm(C)
        blk.attn1 = _TorchAttention(C, C, heads)
        blk.norm2 = tnn.LayerNorm(C)
        blk.attn2 = _TorchAttention(C, ctx_dim, heads)
        blk.norm3 = tnn.LayerNorm(C)
        blk.ff = _TorchGEGLUFF(C)
        self.transformer_blocks = tnn.ModuleList([blk])
        self.proj_out = tnn.Linear(C, C)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.proj_in(h)
        blk = self.transformer_blocks[0]
        h = h + blk.attn1(blk.norm1(h))
        h = h + blk.attn2(blk.norm2(h), ctx)
        h = h + blk.ff(blk.norm3(h))
        h = self.proj_out(h)
        return h.reshape(B, H, W, C).permute(0, 3, 1, 2) + res


def test_transformer2d_parity():
    C, ctx_dim, heads = 32, 24, 2
    torch.manual_seed(1)
    tm = _TorchTransformer2D(C, ctx_dim, heads).eval()
    sd = _np_state_dict(tm, "down_blocks.0.attentions.0.")
    params = convert_unet_state_dict(sd)["down_blocks_0_attentions_0"]

    x = torch.randn(2, C, 6, 6)
    ctx = torch.randn(2, 5, ctx_dim)
    with torch.no_grad():
        want = tm(x, ctx).numpy()

    fm = Transformer2D(heads=heads, dim_head=C // heads)
    got, _ = fm.apply({"params": params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                      jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               atol=ATOL)


# ---------------------------------------------------------------------------
# CLIP text tower vs transformers (the actual upstream implementation)
# ---------------------------------------------------------------------------

def test_clip_text_parity_vs_transformers():
    hf = pytest.importorskip("transformers")
    cfg_kwargs = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                      num_attention_heads=2, num_hidden_layers=2,
                      max_position_embeddings=77, hidden_act="gelu")
    torch.manual_seed(2)
    tm = hf.CLIPTextModel(hf.CLIPTextConfig(**cfg_kwargs)).eval()
    sd = _np_state_dict(tm)
    params = convert_clip_text_state_dict(sd)

    ids = torch.randint(0, 99, (2, 8))
    with torch.no_grad():
        want = tm(input_ids=ids).last_hidden_state.numpy()

    fm = CLIPTextModel(CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_heads=2,
        num_layers=2, max_position_embeddings=77, hidden_act="gelu"))
    got = fm.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


# ---------------------------------------------------------------------------
# Cross-task attention vs a torch twin of the reference module
# (attention.py:463-600 + util/model.py:113-146: per-task LN -> K/V MLP,
#  main-task LN -> Q MLPv2, n_attns-head attention over the TASK axis,
#  output projection)
# ---------------------------------------------------------------------------

class _TorchTaskAttention(tnn.Module):
    def __init__(self, C, T, n_attns, q_hidden, q_hidden_layers):
        super().__init__()
        self.C, self.T, self.h = C, T, n_attns
        mk = lambda: tnn.Sequential(tnn.Linear(C, C // 2), tnn.GELU(),
                                    tnn.Linear(C // 2, C))
        self.norm_k = tnn.ModuleList(tnn.LayerNorm(C) for _ in range(T))
        self.norm_v = tnn.ModuleList(tnn.LayerNorm(C) for _ in range(T))
        self.to_k = tnn.ModuleList(mk() for _ in range(T))
        self.to_v = tnn.ModuleList(mk() for _ in range(T))
        self.norm_q = tnn.ModuleList(tnn.LayerNorm(C) for _ in range(T))
        qdims = [C] + [q_hidden] * (q_hidden_layers + 1) + [C]
        def mq():
            layers = []
            for i in range(len(qdims) - 1):
                layers.append(tnn.Linear(qdims[i], qdims[i + 1]))
                if i < len(qdims) - 2:
                    layers.append(tnn.GELU())
            return tnn.Sequential(*layers)
        self.to_q = tnn.ModuleList(mq() for _ in range(T))
        self.to_out = tnn.Linear(C, C)

    def forward(self, hidden, task_feats, main_idx, aux_idx):
        # hidden [B,N,C]; task_feats [T_aux,B,N,C] aligned with aux_idx
        ks, vs = [], []
        for j, t in enumerate(aux_idx):
            f = task_feats[j]
            ks.append(self.to_k[t](self.norm_k[t](f)))
            vs.append(self.to_v[t](self.norm_v[t](f)))
        k = torch.stack(ks, 0)                     # [Ta,B,N,C]
        v = torch.stack(vs, 0)
        q = self.to_q[main_idx](self.norm_q[main_idx](hidden))  # [B,N,C]
        B, N, C = q.shape
        h, d = self.h, C // self.h
        qh = q.view(B, N, h, d)
        kh = k.view(-1, B, N, h, d)
        vh = v.view(-1, B, N, h, d)
        scores = torch.einsum("bnhd,tbnhd->bnht", qh, kh) / (d ** 0.5)
        probs = torch.softmax(scores, dim=-1)
        out = torch.einsum("bnht,tbnhd->bnhd", probs, vh).reshape(B, N, C)
        return self.to_out(out)


def test_task_attention_bank_parity():
    from stablemtl_tpu.models.transformer import TaskAttentionBank

    C, T, n_attns, qh, qhl = 32, 7, 4, 24, 2
    torch.manual_seed(3)
    tm = _TorchTaskAttention(C, T, n_attns, qh, qhl).eval()

    # pack the torch per-task modules into the stacked bank layout
    def stack(mods, attr_path):
        outs = []
        for m in mods:
            for a in attr_path:
                m = m[a] if isinstance(a, int) else getattr(m, a)
            outs.append(m.detach().numpy())
        return np.stack(outs)

    params = {}
    for nm, norms, mlps in (("k", tm.norm_k, tm.to_k),
                            ("v", tm.norm_v, tm.to_v)):
        params[f"task_norm_{nm}_scale"] = stack(norms, ["weight"])
        params[f"task_norm_{nm}_bias"] = stack(norms, ["bias"])
        params[f"task_to_{nm}_fc1_kernel"] = stack(
            mlps, [0, "weight"]).transpose(0, 2, 1)
        params[f"task_to_{nm}_fc1_bias"] = stack(mlps, [0, "bias"])
        params[f"task_to_{nm}_fc2_kernel"] = stack(
            mlps, [2, "weight"]).transpose(0, 2, 1)
        params[f"task_to_{nm}_fc2_bias"] = stack(mlps, [2, "bias"])
    params["task_norm_q_scale"] = stack(tm.norm_q, ["weight"])
    params["task_norm_q_bias"] = stack(tm.norm_q, ["bias"])
    for li, seq_i in enumerate([0, 2, 4, 6]):
        params[f"task_to_q_net_{2 * li}_kernel"] = stack(
            tm.to_q, [seq_i, "weight"]).transpose(0, 2, 1)
        params[f"task_to_q_net_{2 * li}_bias"] = stack(tm.to_q,
                                                       [seq_i, "bias"])
    params["to_out_task_kernel"] = tm.to_out.weight.detach().numpy().T
    params["to_out_task_bias"] = tm.to_out.bias.detach().numpy()
    params = jax.tree_util.tree_map(jnp.asarray, params)

    B, N = 2, 12
    main_idx, aux = 3, [0, 1, 2, 4, 5, 6]
    hidden = torch.randn(B, N, C)
    feats = torch.randn(len(aux), B, N, C)
    with torch.no_grad():
        want = tm(hidden, feats, main_idx, aux).numpy()

    bank = TaskAttentionBank(dim=C, n_tasks=T, n_attns=n_attns,
                             q_hidden=qh, q_hidden_layers=qhl)
    got = bank.apply({"params": params}, jnp.asarray(hidden.numpy()),
                     jnp.asarray(feats.numpy()), jnp.asarray(main_idx),
                     jnp.asarray(aux))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)

    # the shared-KV inference path (task_kv tables + -inf key bias on the
    # main task) must produce the SAME output
    from stablemtl_tpu.models.transformer import _kv_project

    all_feats = torch.randn(T, B, N, C)
    all_feats[aux] = feats  # main-task slot present but masked out
    k_all = _kv_project(params, jnp.asarray(all_feats.numpy()), None, "k",
                        jnp.float32)
    v_all = _kv_project(params, jnp.asarray(all_feats.numpy()), None, "v",
                        jnp.float32)
    key_bias = jnp.where(jnp.arange(T) == main_idx, -1e9, 0.0)
    got_kv = bank.apply({"params": params}, jnp.asarray(hidden.numpy()),
                        None, jnp.asarray(main_idx), None,
                        task_kv=(k_all, v_all), task_key_bias=key_bias)
    np.testing.assert_allclose(np.asarray(got_kv), want, atol=ATOL)


# ---------------------------------------------------------------------------
# VAE up/down sampling ops vs torch (asymmetric SD padding; the
# transposed-conv upsample vs F.interpolate nearest + conv)
# ---------------------------------------------------------------------------

def test_vae_downsample_asymmetric_padding_parity():
    torch.manual_seed(4)
    conv = tnn.Conv2d(8, 8, 3, stride=2, padding=0).eval()
    x = torch.randn(1, 8, 10, 10)
    with torch.no_grad():
        want = conv(F.pad(x, (0, 1, 0, 1))).numpy()  # SD VAE (0,1)x(0,1)

    kernel = jnp.asarray(conv.weight.detach().numpy()
                         .transpose(2, 3, 1, 0))     # OIHW -> HWIO
    xn = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    dn = jax.lax.conv_dimension_numbers(xn.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    got = jax.lax.conv_general_dilated(
        xn, kernel, (2, 2), ((0, 1), (0, 1)), dimension_numbers=dn)
    got = got + jnp.asarray(conv.bias.detach().numpy())
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               atol=ATOL)


def test_upsample_conv_vs_torch_nearest():
    from stablemtl_tpu.ops.phase_upsample import upsample2x_conv3x3

    torch.manual_seed(5)
    conv = tnn.Conv2d(6, 7, 3, padding=1).eval()
    x = torch.randn(2, 6, 9, 11)
    with torch.no_grad():
        want = conv(F.interpolate(x, scale_factor=2.0,
                                  mode="nearest")).numpy()

    kernel = jnp.asarray(conv.weight.detach().numpy()
                         .transpose(2, 3, 1, 0))
    got = upsample2x_conv3x3(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), kernel,
        jnp.asarray(conv.bias.detach().numpy()))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               atol=ATOL)
