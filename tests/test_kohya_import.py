"""kohya/AddNet LoRA import (convert/kohya.py): export -> import round-trip
and the sample CLI's auto-detection path."""

import numpy as np
import pytest

from scal_sdt_tpu.convert.kohya import from_kohya_format, is_kohya_lora

from helpers import tiny_models, tiny_sdxl_models


def _trained_lora_ckpt(tmp_path, models, target="lora_no-te"):
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from scal_sdt_tpu.training.trainer import Trainer
    from helpers import make_image_dataset, tiny_config

    data = make_image_dataset(tmp_path, n=4)
    cfg = tiny_config(data, tmp_path / "out")
    cfg.optim_target = target
    trainer = Trainer(cfg, tmp_path / "out" / "run", models=models,
                      tokenizer=HashTokenizer())
    trainer.fit(max_steps_override=2)
    return sorted((tmp_path / "out" / "run").glob("*.safetensors"))[-1]


def test_kohya_round_trip_sd1(tmp_path):
    """ckpt_tool lora export -> from_kohya_format reproduces every factor
    tensor under its original prefixed name."""
    from click.testing import CliRunner

    from scal_sdt_tpu.cli.ckpt_tool import main as ckpt_main
    from scal_sdt_tpu.utils.state import load_state_dict

    models = tiny_models()
    ckpt = _trained_lora_ckpt(tmp_path, models)
    orig = {k: np.asarray(v) for k, v in load_state_dict(ckpt).items()
            if ".lora_" in k}
    assert orig

    out = tmp_path / "kohya.safetensors"
    res = CliRunner().invoke(ckpt_main, ["lora", str(ckpt), str(out),
                                         "--dtype", "fp32"])
    assert res.exit_code == 0, res.output
    kohya = load_state_dict(out)
    assert is_kohya_lora(kohya)

    back = from_kohya_format(kohya, models.unet.keys(), models.clip.keys())
    assert set(back) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(back[k], orig[k])


def test_kohya_import_rejects_wrong_base():
    models = tiny_models()
    bad = {"lora_unet_nonexistent_module.lora_down.weight":
           np.zeros((4, 8), np.float32)}
    with pytest.raises(ValueError, match="resolved"):
        from_kohya_format(bad, models.unet.keys(), models.clip.keys())


def test_kohya_1x1_conv_reshape_and_te2(tmp_path):
    """4-D (r, in, 1, 1) conv factors squeeze to our 2-D layout; lora_te2_
    resolves against tower 2."""
    m = tiny_sdxl_models()
    down = np.random.RandomState(0).randn(4, 64, 1, 1).astype(np.float32)
    state = {
        "lora_unet_down_blocks_1_attentions_0_proj_in.lora_down.weight": down,
        "lora_unet_down_blocks_1_attentions_0_proj_in.lora_up.weight":
            np.zeros((64, 4, 1, 1), np.float32),
        "lora_unet_down_blocks_1_attentions_0_proj_in.alpha":
            np.asarray(4.0, np.float32),
        "lora_te2_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight":
            np.zeros((4, 32), np.float32),
        "lora_te2_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight":
            np.zeros((32, 4), np.float32),
    }
    out = from_kohya_format(state, m.unet.keys(), m.clip.keys(),
                            te2_names=m.clip2.keys())
    a = out["unet.down_blocks.1.attentions.0.proj_in.lora_A"]
    assert a.shape == (4, 64)
    np.testing.assert_array_equal(a, down[:, :, 0, 0])
    assert out["unet.down_blocks.1.attentions.0.proj_in.lora_alpha"] == 4
    assert ("condition_model.encoder_2.text_model.encoder.layers.0."
            "self_attn.q_proj.lora_A") in out


def test_sample_with_kohya_lora_changes_output(tmp_path):
    """sample.py's merge path: a kohya LoRA file overlays the base model and
    visibly changes the sampled image."""
    import jax.numpy as jnp
    from click.testing import CliRunner

    from scal_sdt_tpu.cli.ckpt_tool import main as ckpt_main
    from scal_sdt_tpu.cli.sample import _merge_checkpoint
    from scal_sdt_tpu.diffusion.sampler import SamplerSpec, sample_images
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from scal_sdt_tpu.utils.state import load_state_dict, save_state_dict

    models = tiny_models()
    ckpt = _trained_lora_ckpt(tmp_path, models)
    kohya_file = tmp_path / "kohya.safetensors"
    res = CliRunner().invoke(ckpt_main, ["lora", str(ckpt), str(kohya_file),
                                         "--dtype", "fp32"])
    assert res.exit_code == 0, res.output
    # make the adapter factors plainly nonzero so the delta is visible
    kohya = {k: (np.asarray(v) if "alpha" in k else
                 np.random.RandomState(3).randn(*np.asarray(v).shape)
                 .astype(np.float32) * 0.2)
             for k, v in load_state_dict(kohya_file).items()}
    save_state_dict(kohya, kohya_file)

    spec = SamplerSpec(unet_config=models.unet_config,
                       vae_config=models.vae_config,
                       clip_config=models.clip_config,
                       schedule=models.schedule, dtype=jnp.float32)
    kwargs = dict(spec=spec, steps=2, cfg_scale=3.0, width=32, height=32,
                  seed=5, method="ddim")
    base_img = sample_images(models.unet, models.vae, models.clip,
                             HashTokenizer(), ["x"], "", **kwargs)
    _merge_checkpoint(models, kohya_file)
    assert any(".lora_A" in k for k in models.unet)
    lora_img = sample_images(models.unet, models.vae, models.clip,
                             HashTokenizer(), ["x"], "", **kwargs)
    assert np.any(base_img != lora_img)


def test_kohya_sdxl_ldm_naming_round_trip():
    """kohya's SDXL files flatten LDM module paths (its SDXL UNet is
    sgm-style): export renames through the bijection
    (down_blocks.1.attentions.0 -> input_blocks.4.1), import resolves the
    LDM flats back against the diffusers-named base model."""
    from scal_sdt_tpu.cli.ckpt_tool import to_kohya_format
    from scal_sdt_tpu.convert.sd_names import _apply_renames, unet_prefix_map
    from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes

    cfg = UNetConfig.sdxl()
    base_names = list(unet_param_shapes(cfg))
    path = "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q"
    factors = {
        f"{path}.lora_A": np.zeros((4, 640), np.float32),
        f"{path}.lora_B": np.ones((640, 4), np.float32),
        f"{path}.lora_alpha": np.asarray(4, np.int32),
    }
    pairs = unet_prefix_map(cfg)
    renamed = {_apply_renames(k, pairs): v for k, v in factors.items()}
    kohya = to_kohya_format(renamed, "lora_unet")
    key = ("lora_unet_input_blocks_4_1_transformer_blocks_0_attn1_to_q"
           ".lora_down.weight")
    assert key in kohya, sorted(kohya)

    back = from_kohya_format(kohya, base_names, [])
    assert f"unet.{path}.lora_A" in back
    np.testing.assert_array_equal(back[f"unet.{path}.lora_B"],
                                  factors[f"{path}.lora_B"])
    assert back[f"unet.{path}.lora_alpha"] == 4
