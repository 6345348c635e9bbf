"""ckpt_tool prune/lora/graft CLI behaviour.

Prune output must carry the exact LDM (WebUI-loadable) key set; tensors here
are placeholder-shaped since prune is pure renaming + dtype casting.
"""

import json

import numpy as np
import pytest
from click.testing import CliRunner

from scal_sdt_tpu.cli import ckpt_tool
from scal_sdt_tpu.convert.sd_names import unet_name_map
from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes
from scal_sdt_tpu.utils.state import load_state_dict, save_state_dict


UNET_KEYS = list(unet_param_shapes(UNetConfig.sd15()))


def _fake_ckpt(path, ema=False):
    tensors = {f"unet.{k}": np.zeros((2,), np.float32) for k in UNET_KEYS}
    if ema:
        tensors.update({f"unet_ema.shadow_params.{k}": np.ones((2,), np.float32)
                        for k in UNET_KEYS})
    save_state_dict(tensors, path, metadata={"json": json.dumps({"step": 10})})
    return path


def test_prune_emits_full_ldm_unet_key_set(tmp_path):
    ckpt = _fake_ckpt(tmp_path / "train.safetensors")
    out = tmp_path / "pruned.safetensors"
    result = CliRunner().invoke(ckpt_tool.main,
                                ["prune", str(ckpt), str(out), "--unet-dtype", "fp16"])
    assert result.exit_code == 0, result.output
    state = load_state_dict(out)
    expected = {f"model.diffusion_model.{v}"
                for v in unet_name_map(UNetConfig.sd15(), UNET_KEYS).values()}
    assert set(state.keys()) == expected
    assert all(v.dtype == np.float16 for v in state.values())


def test_prune_ema_uses_shadow_weights(tmp_path):
    ckpt = _fake_ckpt(tmp_path / "train.safetensors", ema=True)
    out = tmp_path / "pruned_ema.safetensors"
    result = CliRunner().invoke(ckpt_tool.main,
                                ["prune", str(ckpt), str(out), "--ema"])
    assert result.exit_code == 0, result.output
    state = load_state_dict(out)
    # shadow was ones, live weights zeros
    assert all(float(v[0]) == 1.0 for v in state.values())


def test_prune_refuses_overwrite(tmp_path):
    ckpt = _fake_ckpt(tmp_path / "train.safetensors")
    out = tmp_path / "out.safetensors"
    out.write_bytes(b"x")
    result = CliRunner().invoke(ckpt_tool.main, ["prune", str(ckpt), str(out)])
    assert result.exit_code != 0
    result = CliRunner().invoke(ckpt_tool.main,
                                ["prune", str(ckpt), str(out), "--overwrite"])
    assert result.exit_code == 0, result.output


def test_lora_cmd_exports_kohya_format(tmp_path):
    tensors = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.lora_A":
            np.zeros((4, 32), np.float32),
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.lora_B":
            np.zeros((32, 4), np.float32),
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.lora_alpha":
            np.asarray(1, np.int32),
        "condition_model.encoder.text_model.encoder.layers.0.self_attn.q_proj.lora_A":
            np.zeros((4, 16), np.float32),
        "condition_model.encoder.text_model.encoder.layers.0.self_attn.q_proj.lora_B":
            np.zeros((16, 4), np.float32),
        "condition_model.encoder.text_model.encoder.layers.0.self_attn.q_proj.lora_alpha":
            np.asarray(1, np.int32),
    }
    ckpt = tmp_path / "lora.safetensors"
    save_state_dict(tensors, ckpt)
    out = tmp_path / "kohya.safetensors"
    result = CliRunner().invoke(ckpt_tool.main, ["lora", str(ckpt), str(out)])
    assert result.exit_code == 0, result.output
    state = load_state_dict(out)
    assert ("lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn2_to_k"
            ".lora_down.weight") in state
    assert "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight" in state
    assert state["lora_te_text_model_encoder_layers_0_self_attn_q_proj.alpha"].dtype == np.int32
    # fp16 default for factors
    assert state["lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn2_to_k"
                 ".lora_down.weight"].dtype == np.float16
