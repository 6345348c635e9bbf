"""LDM<->diffusers name-map correctness.

`ckpt_tool prune` output must be WebUI/LDM loadable with the exact key set a
reference-pruned checkpoint carries (SURVEY.md §2 #13). These expected pairs
are well-known public SD1.5 layout facts; the map was additionally verified
exhaustively (686 UNet + 248 VAE keys, zero mismatches) against the
reference converter's behaviour during development.
"""

from scal_sdt_tpu.convert.sd_names import (
    convert_unet_state_ldm_to_df,
    unet_name_map,
    vae_name_map,
)
from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes
from scal_sdt_tpu.models.vae import VAEConfig, vae_param_shapes

EXPECTED_UNET_PAIRS = {
    "time_embedding.linear_1.weight": "time_embed.0.weight",
    "conv_in.weight": "input_blocks.0.0.weight",
    "conv_norm_out.bias": "out.0.bias",
    "conv_out.weight": "out.2.weight",
    "down_blocks.0.resnets.0.norm1.weight": "input_blocks.1.0.in_layers.0.weight",
    "down_blocks.0.resnets.0.conv1.weight": "input_blocks.1.0.in_layers.2.weight",
    "down_blocks.0.resnets.0.time_emb_proj.weight": "input_blocks.1.0.emb_layers.1.weight",
    "down_blocks.0.resnets.1.conv2.weight": "input_blocks.2.0.out_layers.3.weight",
    "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight",
    "down_blocks.0.downsamplers.0.conv.weight": "input_blocks.3.0.op.weight",
    "down_blocks.1.resnets.0.conv_shortcut.weight": "input_blocks.4.0.skip_connection.weight",
    "down_blocks.3.resnets.0.norm1.weight": "input_blocks.10.0.in_layers.0.weight",
    "mid_block.resnets.0.conv1.weight": "middle_block.0.in_layers.2.weight",
    "mid_block.attentions.0.proj_in.weight": "middle_block.1.proj_in.weight",
    "mid_block.resnets.1.conv2.bias": "middle_block.2.out_layers.3.bias",
    "up_blocks.0.resnets.0.norm1.weight": "output_blocks.0.0.in_layers.0.weight",
    "up_blocks.0.upsamplers.0.conv.weight": "output_blocks.2.1.conv.weight",
    "up_blocks.1.attentions.0.proj_out.bias": "output_blocks.3.1.proj_out.bias",
    "up_blocks.1.upsamplers.0.conv.weight": "output_blocks.5.2.conv.weight",
    "up_blocks.3.resnets.2.conv2.weight": "output_blocks.11.0.out_layers.3.weight",
}

EXPECTED_VAE_PAIRS = {
    "encoder.conv_in.weight": "encoder.conv_in.weight",
    "encoder.conv_norm_out.weight": "encoder.norm_out.weight",
    "encoder.down_blocks.0.resnets.0.norm1.weight": "encoder.down.0.block.0.norm1.weight",
    "encoder.down_blocks.1.resnets.0.conv_shortcut.weight": "encoder.down.1.block.0.nin_shortcut.weight",
    "encoder.down_blocks.0.downsamplers.0.conv.weight": "encoder.down.0.downsample.conv.weight",
    "encoder.mid_block.resnets.0.conv1.weight": "encoder.mid.block_1.conv1.weight",
    "encoder.mid_block.attentions.0.group_norm.weight": "encoder.mid.attn_1.norm.weight",
    "encoder.mid_block.attentions.0.to_q.weight": "encoder.mid.attn_1.q.weight",
    "encoder.mid_block.attentions.0.to_out.0.weight": "encoder.mid.attn_1.proj_out.weight",
    "decoder.up_blocks.0.resnets.0.norm1.weight": "decoder.up.3.block.0.norm1.weight",
    "decoder.up_blocks.0.upsamplers.0.conv.weight": "decoder.up.3.upsample.conv.weight",
    "decoder.up_blocks.3.resnets.2.conv2.weight": "decoder.up.0.block.2.conv2.weight",
    "decoder.up_blocks.2.resnets.0.conv_shortcut.weight": "decoder.up.1.block.0.nin_shortcut.weight",
    "quant_conv.weight": "quant_conv.weight",
    "post_quant_conv.bias": "post_quant_conv.bias",
}


def test_unet_name_map_expected_pairs():
    names = list(unet_param_shapes(UNetConfig.sd15()))
    m = unet_name_map(UNetConfig.sd15(), names)
    for df, ldm in EXPECTED_UNET_PAIRS.items():
        assert m[df] == ldm, (df, m[df], ldm)


def test_unet_name_map_is_bijection():
    names = list(unet_param_shapes(UNetConfig.sd15()))
    m = unet_name_map(UNetConfig.sd15(), names)
    assert len(m) == len(names) == 686
    assert len(set(m.values())) == len(names)
    # no diffusers-style names leak into the LDM side
    for v in m.values():
        assert "down_blocks" not in v and "up_blocks" not in v and "resnets" not in v


def test_vae_name_map_expected_pairs():
    names = list(vae_param_shapes(VAEConfig.sd15()))
    m = vae_name_map(VAEConfig.sd15(), names)
    for df, ldm in EXPECTED_VAE_PAIRS.items():
        assert m[df] == ldm, (df, m[df], ldm)
    assert len(m) == len(names) == 248
    assert len(set(m.values())) == len(names)


def test_unet_roundtrip():
    import numpy as np

    names = list(unet_param_shapes(UNetConfig.sd15()))
    m = unet_name_map(UNetConfig.sd15(), names)
    ldm_state = {v: np.zeros(2) for v in m.values()}
    back = convert_unet_state_ldm_to_df(ldm_state)
    assert set(back.keys()) == set(names)
