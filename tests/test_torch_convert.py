"""Converter tests with handcrafted diffusers/transformers-style state dicts."""

import numpy as np

from stablemtl_tpu.models.torch_convert import (
    convert_clip_text_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
    flatten_tree,
)


def test_unet_key_mapping_and_transposes():
    sd = {
        "conv_in.weight": np.zeros((32, 12, 3, 3)),
        "conv_in.bias": np.zeros((32,)),
        "time_embedding.linear_1.weight": np.zeros((128, 32)),
        "time_embedding.linear_1.bias": np.zeros((128,)),
        "down_blocks.0.resnets.1.norm1.weight": np.ones((32,)),
        "down_blocks.0.resnets.1.conv1.weight": np.zeros((32, 32, 3, 3)),
        "down_blocks.0.downsamplers.0.conv.weight": np.zeros((32, 32, 3, 3)),
        "down_blocks.0.attentions.0.proj_in.weight": np.zeros((32, 32)),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
            np.zeros((32, 32)),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight":
            np.zeros((32, 32)),
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight":
            np.zeros((256, 32)),
        "down_blocks.0.attentions.0.transformer_blocks.0.norm1.weight":
            np.ones((32,)),
        "mid_block.resnets.0.conv2.bias": np.zeros((64,)),
        "mid_block.attentions.0.proj_out.weight": np.zeros((32, 32)),
        "up_blocks.1.attentions.2.transformer_blocks.0.attn2.to_k.weight":
            np.zeros((32, 16)),
        "conv_norm_out.weight": np.ones((32,)),
        "conv_out.weight": np.zeros((4, 32, 3, 3)),
    }
    tree = convert_unet_state_dict(sd)
    flat = flatten_tree(tree)
    assert flat["conv_in.kernel"].shape == (3, 3, 12, 32)
    assert flat["time_embedding.linear_1.kernel"].shape == (32, 128)
    assert flat["down_blocks_0_resnets_1.norm1.scale"].shape == (32,)
    assert flat["down_blocks_0_resnets_1.conv1.kernel"].shape == (3, 3, 32, 32)
    assert flat["down_blocks_0_downsamplers_0.conv.kernel"].shape == (3, 3, 32, 32)
    assert ("down_blocks_0_attentions_0.transformer_blocks_0.attn1.to_q.kernel"
            in flat)
    assert ("down_blocks_0_attentions_0.transformer_blocks_0.attn1.to_out_0.kernel"
            in flat)
    assert flat["down_blocks_0_attentions_0.transformer_blocks_0.ff.net_0.proj.kernel"].shape == (32, 256)
    assert flat["down_blocks_0_attentions_0.transformer_blocks_0.norm1.scale"].shape == (32,)
    assert "mid_block_resnets_0.conv2.bias" in flat
    assert "mid_block_attentions_0.proj_out.kernel" in flat
    assert flat["up_blocks_1_attentions_2.transformer_blocks_0.attn2.to_k.kernel"].shape == (16, 32)
    assert flat["conv_norm_out.scale"].shape == (32,)


def test_unet_task_bank_stacking():
    tasks = ("normal", "depth", "semantic")
    C = 8
    base = "down_blocks.0.attentions.0.transformer_blocks.0.attn1"
    sd = {}
    for ti, t in enumerate(tasks):
        sd[f"{base}.task_to_k.{t}.fc1.weight"] = np.full((C // 2, C), ti, np.float32)
        sd[f"{base}.task_to_k.{t}.fc1.bias"] = np.full((C // 2,), ti, np.float32)
        sd[f"{base}.task_to_k.{t}.fc2.weight"] = np.full((C, C // 2), ti, np.float32)
        sd[f"{base}.task_to_k.{t}.fc2.bias"] = np.full((C,), ti, np.float32)
        sd[f"{base}.task_norm_k.{t}.weight"] = np.full((C,), ti, np.float32)
        sd[f"{base}.task_norm_k.{t}.bias"] = np.full((C,), ti, np.float32)
        sd[f"{base}.task_to_q.{t}.net.0.weight"] = np.full((4, C), ti, np.float32)
        sd[f"{base}.task_to_q.{t}.net.0.bias"] = np.full((4,), ti, np.float32)
    sd[f"{base}.to_out_task.weight"] = np.zeros((C, C), np.float32)
    sd[f"{base}.to_out_task.bias"] = np.zeros((C,), np.float32)

    tree = convert_unet_state_dict(sd, tasks=tasks)
    flat = flatten_tree(tree)
    ta = "down_blocks_0_attentions_0.transformer_blocks_0.task_attn"
    k1 = flat[f"{ta}.task_to_k_fc1_kernel"]
    assert k1.shape == (3, C, C // 2)  # stacked, transposed
    for ti in range(3):
        assert (k1[ti] == ti).all()
    assert flat[f"{ta}.task_norm_k_scale"].shape == (3, C)
    assert flat[f"{ta}.task_to_q_net_0_kernel"].shape == (3, C, 4)
    assert flat[f"{ta}.to_out_task_kernel"].shape == (C, C)


def test_vae_key_mapping():
    sd = {
        "encoder.conv_in.weight": np.zeros((16, 3, 3, 3)),
        "encoder.down_blocks.0.resnets.0.conv1.weight": np.zeros((16, 16, 3, 3)),
        "encoder.down_blocks.0.downsamplers.0.conv.weight": np.zeros((16, 16, 3, 3)),
        "encoder.mid_block.attentions.0.to_q.weight": np.zeros((32, 32)),
        "encoder.mid_block.attentions.0.group_norm.weight": np.ones((32,)),
        "decoder.up_blocks.0.upsamplers.0.conv.weight": np.zeros((32, 32, 3, 3)),
        "quant_conv.weight": np.zeros((8, 8, 1, 1)),
        "post_quant_conv.bias": np.zeros((4,)),
    }
    tree = convert_vae_state_dict(sd)
    flat = flatten_tree(tree)
    assert flat["encoder.conv_in.kernel"].shape == (3, 3, 3, 16)
    assert "encoder.down_blocks_0_resnets_0.conv1.kernel" in flat
    assert "encoder.down_blocks_0_downsamplers_0_conv.kernel" in flat
    assert "encoder.mid_block_attentions_0.to_q.kernel" in flat
    assert "encoder.mid_block_attentions_0.group_norm.scale" in flat
    assert "decoder.up_blocks_0_upsamplers_0_conv.kernel" in flat
    assert flat["quant_conv.kernel"].shape == (1, 1, 8, 8)


def test_clip_key_mapping():
    sd = {
        "text_model.embeddings.token_embedding.weight": np.zeros((100, 8)),
        "text_model.embeddings.position_embedding.weight": np.zeros((77, 8)),
        "text_model.encoder.layers.0.self_attn.q_proj.weight": np.zeros((8, 8)),
        "text_model.encoder.layers.0.self_attn.q_proj.bias": np.zeros((8,)),
        "text_model.encoder.layers.0.layer_norm1.weight": np.ones((8,)),
        "text_model.encoder.layers.0.mlp.fc1.weight": np.zeros((32, 8)),
        "text_model.final_layer_norm.weight": np.ones((8,)),
        "text_model.final_layer_norm.bias": np.zeros((8,)),
    }
    tree = convert_clip_text_state_dict(sd)
    flat = flatten_tree(tree)
    assert flat["token_embedding"].shape == (100, 8)
    assert "layers_0_q_proj.kernel" in flat
    assert "layers_0_layer_norm1.scale" in flat
    assert flat["layers_0_fc1.kernel"].shape == (8, 32)
    assert "final_layer_norm.scale" in flat
