"""SD2.x model-family support: config parsing + architecture wiring.

The reference trains SD2.x models through the diffusers pipeline loader
(`/root/reference/modules/model.py:81-93` — whatever architecture the
pipeline dir declares) and converts SD2 LDM checkpoints via
num_head_channels (`/root/reference/modules/convert/sd_to_diffusers.py:198-206`).
Our equivalents: per-level head counts, linear Transformer2D projections,
gelu text-encoder activation.
"""

import numpy as np
import jax
import jax.numpy as jnp

from scal_sdt_tpu.convert.loader import _clip_config_from_df, _unet_config_from_df
from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes


SD21_UNET_CFG = {
    "in_channels": 4, "out_channels": 4,
    "block_out_channels": [320, 640, 1280, 1280],
    "layers_per_block": 2,
    "attention_head_dim": [5, 10, 20, 20],
    "use_linear_projection": True,
    "cross_attention_dim": 1024,
    "down_block_types": ["CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                         "CrossAttnDownBlock2D", "DownBlock2D"],
    "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D",
                       "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"],
    "norm_num_groups": 32, "sample_size": 96,
}


def test_sd21_config_from_diffusers_json():
    cfg = _unet_config_from_df(SD21_UNET_CFG)
    assert cfg.num_attention_heads == (5, 10, 20, 20)
    assert cfg.use_linear_projection
    assert cfg.cross_attention_dim == 1024
    assert cfg.heads_at(0) == 5 and cfg.heads_at(3) == 20
    # per-level head_dim is constant 64 (the SD2 signature)
    for lvl, c in enumerate(cfg.block_out_channels):
        assert c // cfg.heads_at(lvl) == 64


def test_sd21_clip_config_gelu():
    cfg = _clip_config_from_df({"hidden_size": 1024, "intermediate_size": 4096,
                                "num_hidden_layers": 23, "num_attention_heads": 16,
                                "hidden_act": "gelu"})
    assert cfg.hidden_act == "gelu"
    assert cfg.hidden_size == 1024


def test_sd21_param_shapes_linear_projections():
    shapes = unet_param_shapes(UNetConfig.sd21())
    assert shapes["down_blocks.0.attentions.0.proj_in.weight"] == (320, 320)
    assert shapes["mid_block.attentions.0.proj_out.weight"] == (1280, 1280)
    assert shapes["down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"] == (320, 1024)
    # same key inventory as SD1.5 (names identical, only shapes differ)
    assert set(shapes) == set(unet_param_shapes(UNetConfig.sd15()))


def test_sd2_ldm_yaml_head_channels():
    from scal_sdt_tpu.conf import Config

    ldm = Config({
        "model": {"params": {"unet_config": {"params": {
            "model_channels": 320, "channel_mult": [1, 2, 4, 4],
            "num_res_blocks": 2, "in_channels": 4, "out_channels": 4,
            "attention_resolutions": [4, 2, 1], "context_dim": 1024,
            "num_head_channels": 64, "use_linear_in_transformer": True,
        }}}},
    })
    cfg = UNetConfig.from_ldm_config(ldm)
    assert cfg.num_attention_heads == (5, 10, 20, 20)
    assert cfg.use_linear_projection
    assert cfg.cross_attention_dim == 1024
