"""SDXL model family: UNet (per-level transformer depth + text_time
micro-conditioning) and dual-text-encoder CLIP (pooled projection,
penultimate hidden state).

UNet parity runs against the independent torch oracle
(lab/torch_parity.py); CLIP parity runs against transformers'
CLIPTextModelWithProjection.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from scal_sdt_tpu.models.clip import (
    CLIPTextConfig, clip_param_shapes, clip_text_encode_sdxl)
from scal_sdt_tpu.models.unet import (
    UNetConfig, init_unet_params, unet_apply, unet_param_shapes)

from lab.torch_parity import unet_forward


def _to_torch(params):
    return {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}


def test_sdxl_unet_param_count_matches_diffusers():
    """The exact SDXL-base UNet parameter count (2,567,463,684) proves the
    shape template reproduces diffusers' architecture field-for-field."""
    shapes = unet_param_shapes(UNetConfig.sdxl())
    n = sum(int(np.prod(s)) for s in shapes.values())
    assert n == 2_567_463_684


def test_sdxl_transformer_depth_per_level():
    cfg = UNetConfig.tiny_sdxl()
    shapes = unet_param_shapes(cfg)
    # level 1 has depth 2: transformer_blocks.1 exists there but nowhere at
    # depth-1 levels; mid block uses the last level's depth (2)
    assert "down_blocks.1.attentions.0.transformer_blocks.1.norm1.weight" in shapes
    assert "mid_block.attentions.0.transformer_blocks.1.norm1.weight" in shapes
    assert not any(k.startswith("down_blocks.0.attentions") for k in shapes)
    # up level 0 mirrors down level 1 (depth 2)
    assert "up_blocks.0.attentions.0.transformer_blocks.1.norm1.weight" in shapes


def test_sdxl_unet_forward_parity_vs_torch():
    config = UNetConfig.tiny_sdxl()
    params = init_unet_params(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    b = 2
    sample = rng.randn(b, 16, 16, 4).astype(np.float32)
    timesteps = np.array([7, 421], dtype=np.int32)
    context = rng.randn(b, 11, config.cross_attention_dim).astype(np.float32)
    text_embeds = rng.randn(b, 32).astype(np.float32)
    time_ids = np.array([[512, 512, 0, 0, 512, 512],
                         [768, 512, 0, 128, 512, 512]], dtype=np.float32)

    out_jax = np.asarray(unet_apply(
        params, jnp.asarray(sample), jnp.asarray(timesteps),
        jnp.asarray(context), config,
        added_cond={"text_embeds": jnp.asarray(text_embeds),
                    "time_ids": jnp.asarray(time_ids)}))

    out_torch = unet_forward(
        _to_torch(params), torch.from_numpy(sample).permute(0, 3, 1, 2),
        torch.from_numpy(timesteps.astype(np.int64)),
        torch.from_numpy(context), config,
        added_cond={"text_embeds": torch.from_numpy(text_embeds),
                    "time_ids": torch.from_numpy(time_ids)},
    ).permute(0, 2, 3, 1).numpy()

    scale = np.abs(out_torch).max()
    assert np.abs(out_jax - out_torch).max() / scale < 1e-3


def test_sdxl_added_cond_changes_output():
    config = UNetConfig.tiny_sdxl()
    params = init_unet_params(jax.random.PRNGKey(0), config, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 11, config.cross_attention_dim))
    a = unet_apply(params, x, t, ctx, config,
                   added_cond={"text_embeds": jnp.zeros((1, 32)),
                               "time_ids": jnp.zeros((1, 6))})
    b = unet_apply(params, x, t, ctx, config,
                   added_cond={"text_embeds": jnp.ones((1, 32)),
                               "time_ids": jnp.full((1, 6), 512.0)})
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def _build_projection_pair(num_layers=3):
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=num_layers, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="gelu",
        projection_dim=48, eos_token_id=2,
    )
    torch.manual_seed(0)
    model = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    params = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()
              if "position_ids" not in k}
    ours_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=num_layers, num_attention_heads=4,
        hidden_act="gelu", projection_dim=48, eos_token_id=2)
    return model, params, ours_cfg


def test_sdxl_clip_penultimate_and_pooled_parity():
    model, params, cfg = _build_projection_pair()
    ids = np.array([[1, 5, 7, 9, 2] + [0] * 72,
                    [1, 42, 2] + [0] * 74], dtype=np.int64)
    with torch.no_grad():
        out = model(torch.from_numpy(ids), output_hidden_states=True)
    theirs_penult = out.hidden_states[-2].numpy()
    theirs_pooled = out.text_embeds.numpy()

    penult, pooled = clip_text_encode_sdxl(
        params, jnp.asarray(ids.astype(np.int32)), cfg)
    np.testing.assert_allclose(np.asarray(penult), theirs_penult,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), theirs_pooled,
                               rtol=2e-4, atol=2e-4)


def test_sdxl_clip_shapes_include_projection():
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         projection_dim=24)
    shapes = clip_param_shapes(cfg)
    assert shapes["text_projection.weight"] == (24, 32)


def test_sdxl_g_config_is_bigg():
    cfg = CLIPTextConfig.sdxl_g()
    assert cfg.hidden_size == 1280 and cfg.num_hidden_layers == 32
    assert cfg.projection_dim == 1280 and cfg.hidden_act == "gelu"


# ---------------------------------------------------------------------------
# Loader + end-to-end training
# ---------------------------------------------------------------------------

def test_sdxl_diffusers_dir_round_trip(tmp_path):
    from scal_sdt_tpu.conf import Config, default, merge
    from scal_sdt_tpu.convert.loader import load_components
    from helpers import tiny_sdxl_models, write_diffusers_dir

    models = tiny_sdxl_models()
    model_dir = write_diffusers_dir(models, tmp_path / "tiny-sdxl")
    cfg = merge(default(), Config({"model": str(model_dir)}))
    loaded = load_components(cfg)
    assert loaded.is_sdxl
    assert loaded.clip2 is not None
    assert loaded.clip2_config.projection_dim == 32
    assert loaded.unet_config.transformer_layers_per_block == (1, 2)
    assert "text_projection.weight" in loaded.clip2


def test_sdxl_training_end_to_end(tmp_path):
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from scal_sdt_tpu.training.trainer import Trainer
    from helpers import make_image_dataset, tiny_config, tiny_sdxl_models

    data = make_image_dataset(tmp_path, n=4)
    cfg = tiny_config(data, tmp_path / "out")
    trainer = Trainer(cfg, tmp_path / "out" / "run",
                      models=tiny_sdxl_models(), tokenizer=HashTokenizer())
    metrics = trainer.fit(max_steps_override=2)
    assert np.isfinite(float(metrics["train_loss"]))
    # tower 2 stays frozen under the full_unet target
    assert not any(k.startswith("condition_model.encoder_2.")
                   for k in trainer.state.trainable)
    assert any(k.startswith("condition_model.encoder_2.")
               for k in trainer.frozen)


def _write_cache(path, n, cond_dim=None, pooled_dim=None, latent_hw=4):
    import json
    from scal_sdt_tpu.utils.state import save_state_dict

    rng = np.random.RandomState(0)
    cache, sizes = {}, {}
    for i in range(n):
        lat = rng.randn(latent_hw, latent_hw, 4).astype(np.float32)
        cache[f"{i}.latent.0"] = lat
        sizes[f"{i}.latent.0"] = list(lat.shape)
        if cond_dim:
            cache[f"{i}.cond"] = rng.randn(77, cond_dim).astype(np.float32)
        if pooled_dim:
            cache[f"{i}.pooled"] = rng.randn(pooled_dim).astype(np.float32)
    meta = {"sizes": sizes, "entries": list(range(n)), "total_entries": n,
            "aug_group_size": 1}
    save_state_dict(cache, path, "safetensors",
                    metadata={"json": json.dumps(meta)})


def test_sdxl_rejects_cache_without_pooled(tmp_path):
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from scal_sdt_tpu.training.trainer import Trainer
    from helpers import make_image_dataset, tiny_config, tiny_sdxl_models

    data = make_image_dataset(tmp_path, n=4)
    cfg = tiny_config(data, tmp_path / "out")
    cache = tmp_path / "cache.safetensors"
    _write_cache(cache, 4, cond_dim=64)      # SD1-style: cond, no pooled
    cfg.data.cache = str(cache)
    with pytest.raises(ValueError, match="pooled"):
        Trainer(cfg, tmp_path / "out" / "run",
                models=tiny_sdxl_models(), tokenizer=HashTokenizer())


def test_sdxl_trains_from_pooled_cache(tmp_path):
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from scal_sdt_tpu.training.trainer import Trainer
    from helpers import make_image_dataset, tiny_config, tiny_sdxl_models

    data = make_image_dataset(tmp_path, n=4)
    cfg = tiny_config(data, tmp_path / "out")
    cache = tmp_path / "cache.safetensors"
    _write_cache(cache, 4, cond_dim=64, pooled_dim=32)
    cfg.data.cache = str(cache)
    trainer = Trainer(cfg, tmp_path / "out" / "run",
                      models=tiny_sdxl_models(), tokenizer=HashTokenizer())
    metrics = trainer.fit(max_steps_override=2)
    assert np.isfinite(float(metrics["train_loss"]))


def test_sdxl_sample_images_end_to_end():
    from scal_sdt_tpu.diffusion.sampler import SamplerSpec, sample_images
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from helpers import tiny_sdxl_models

    m = tiny_sdxl_models()
    spec = SamplerSpec(unet_config=m.unet_config, vae_config=m.vae_config,
                       clip_config=m.clip_config, schedule=m.schedule,
                       dtype=jnp.float32, clip2_config=m.clip2_config)
    out = sample_images(m.unet, m.vae, m.clip, HashTokenizer(),
                        ["a test prompt"], "", spec, steps=3, cfg_scale=5.0,
                        width=32, height=32, seed=3, method="dpmpp_2m",
                        clip2_params=m.clip2)
    assert out.shape == (1, 32, 32, 3) and out.dtype == np.uint8

    with pytest.raises(ValueError, match="clip2_params"):
        sample_images(m.unet, m.vae, m.clip, HashTokenizer(),
                      ["a test prompt"], "", spec, steps=1, width=32,
                      height=32)


def test_sdxl_lora_training_end_to_end(tmp_path):
    """The kohya-favourite mode: LoRA on the SDXL UNet attention/ff paths
    through the same optim-target engine as SD1.x."""
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from scal_sdt_tpu.training.trainer import Trainer
    from helpers import make_image_dataset, tiny_config, tiny_sdxl_models

    data = make_image_dataset(tmp_path, n=4)
    cfg = tiny_config(data, tmp_path / "out")
    cfg.optim_target = "lora_no-te"
    trainer = Trainer(cfg, tmp_path / "out" / "run",
                      models=tiny_sdxl_models(), tokenizer=HashTokenizer())
    metrics = trainer.fit(max_steps_override=2)
    assert np.isfinite(float(metrics["train_loss"]))
    # only LoRA factors train; base UNet + both towers stay frozen
    # (slab packing renames trainable leaves -> resolve via the pack spec)
    keys = {k for k in trainer.state.trainable
            if "__slab__" not in k and "__stack__" not in k}
    if trainer.pack_spec is not None:
        keys |= trainer.pack_spec.packed_keys
    assert keys and all(".lora_" in k or k.endswith("alpha") for k in keys), \
        sorted(keys)[:5]


def _to_openclip_layout(clip2: dict) -> dict:
    """Library inverse conversion + the logit_scale leaf a real OpenCLIP
    state carries (dropped knowingly on load)."""
    from scal_sdt_tpu.convert.sd_names import (
        convert_transformers_text_to_openclip)

    out = convert_transformers_text_to_openclip(clip2)
    out["logit_scale"] = np.zeros((), np.float32)
    return out


def test_openclip_conversion_round_trip():
    """transformers -> OpenCLIP -> transformers is the identity (incl.
    text_projection transposition) for a non-24-layer tower."""
    from scal_sdt_tpu.convert.sd_names import (
        convert_openclip_text_to_transformers,
        convert_transformers_text_to_openclip)
    from helpers import tiny_sdxl_models

    clip2 = {k: np.asarray(v) for k, v in tiny_sdxl_models().clip2.items()}
    oc = convert_transformers_text_to_openclip(clip2)
    back = convert_openclip_text_to_transformers(oc, keep_projection=True)
    assert set(back) == set(clip2)
    for k in clip2:
        np.testing.assert_array_equal(back[k], clip2[k])


def test_sdxl_single_file_load(tmp_path):
    """WebUI-style SDXL single-file checkpoint (sgm namespace) loads through
    load_ldm_checkpoint: UNet bijection incl. label_emb, CLIP-L passthrough,
    OpenCLIP bigG tower conversion with text_projection."""
    from scal_sdt_tpu.conf import Config
    from scal_sdt_tpu.convert.loader import load_ldm_checkpoint
    from scal_sdt_tpu.convert.sd_names import (
        convert_unet_state_df_to_ldm, convert_vae_state_df_to_ldm)
    from scal_sdt_tpu.utils.state import save_state_dict
    from helpers import tiny_sdxl_models

    m = tiny_sdxl_models(vocab_size=512)
    state = {}
    for k, v in convert_unet_state_df_to_ldm(m.unet, m.unet_config).items():
        state[f"model.diffusion_model.{k}"] = np.asarray(v)
    for k, v in convert_vae_state_df_to_ldm(m.vae, m.vae_config).items():
        state[f"first_stage_model.{k}"] = np.asarray(v)
    for k, v in m.clip.items():
        state[f"conditioner.embedders.0.transformer.{k}"] = np.asarray(v)
    for k, v in _to_openclip_layout(m.clip2).items():
        state[f"conditioner.embedders.1.model.{k}"] = np.asarray(v)
    ckpt = tmp_path / "sdxl.safetensors"
    save_state_dict(state, ckpt)

    u = m.unet_config
    sgm = Config({"model": {"params": {
        "network_config": {"params": {
            "adm_in_channels": u.projection_class_embeddings_input_dim,
            "num_classes": "sequential",
            "in_channels": 4, "out_channels": 4, "model_channels": 32,
            "attention_resolutions": [2], "num_res_blocks": 1,
            "channel_mult": [1, 2], "num_head_channels": 16,
            "use_linear_in_transformer": True,
            "transformer_depth": [1, 2], "context_dim": 64,
            "num_groups": 8, "addition_time_embed_dim": 8,
        }},
        "first_stage_config": {"params": {"ddconfig": {
            "ch": m.vae_config.block_out_channels[0],
            "in_channels": 3, "out_ch": 3,
            "z_channels": m.vae_config.latent_channels,
            "ch_mult": [c // m.vae_config.block_out_channels[0]
                        for c in m.vae_config.block_out_channels],
            "num_res_blocks": m.vae_config.layers_per_block,
            "num_groups": m.vae_config.norm_num_groups,
        }}},
    }}})

    loaded = load_ldm_checkpoint(ckpt, sgm)
    assert loaded.is_sdxl and loaded.clip2 is not None
    assert loaded.unet_config.transformer_layers_per_block == (1, 2)
    assert loaded.unet_config.down_block_types == (
        "DownBlock2D", "CrossAttnDownBlock2D")
    assert loaded.vae_config.scaling_factor == 0.13025
    # round-trip exactness on a couple of representative tensors
    np.testing.assert_array_equal(
        loaded.unet["add_embedding.linear_1.weight"],
        np.asarray(m.unet["add_embedding.linear_1.weight"]))
    np.testing.assert_array_equal(
        loaded.clip2["text_projection.weight"],
        np.asarray(m.clip2["text_projection.weight"]))
    np.testing.assert_array_equal(
        loaded.clip2["text_model.encoder.layers.0.self_attn.k_proj.weight"],
        np.asarray(m.clip2["text_model.encoder.layers.0.self_attn.k_proj.weight"]))
    assert loaded.clip2_config.projection_dim == 32


def test_sdxl_unet_ldm_bijection_full_keyset():
    """df->ldm->df over the REAL SDXL key set (dummy tensors; linear
    projections mean pure renames) — proves the bijection incl. label_emb
    and 3-level block indexing."""
    from scal_sdt_tpu.convert.sd_names import (
        convert_unet_state_df_to_ldm, convert_unet_state_ldm_to_df)

    cfg = UNetConfig.sdxl()
    names = unet_param_shapes(cfg)
    state = {k: np.zeros(1, np.float32) for k in names}
    ldm = convert_unet_state_df_to_ldm(state, cfg)
    assert "label_emb.0.0.weight" in ldm and "label_emb.0.2.bias" in ldm
    assert "time_embed.0.weight" in ldm
    # SDXL: 9 input blocks (conv_in + 2x3 resnet layers + 2 downsamplers)
    import re
    in_blocks = {int(m.group(1)) for k in ldm
                 if (m := re.match(r"input_blocks\.(\d+)\.", k))}
    assert in_blocks == set(range(9)), sorted(in_blocks)
    back = convert_unet_state_ldm_to_df(ldm, cfg)
    assert set(back) == set(state)


def test_sdxl_dual_tower_lora_and_kohya_export(tmp_path):
    """lora_sdxl optim target: LoRA trains on the UNet AND both text towers;
    ckpt_tool lora exports kohya SDXL naming (lora_te1_/lora_te2_)."""
    from click.testing import CliRunner

    from scal_sdt_tpu.cli.ckpt_tool import main as ckpt_main
    from scal_sdt_tpu.text.tokenizer import HashTokenizer
    from scal_sdt_tpu.training.trainer import Trainer
    from scal_sdt_tpu.utils.state import load_state_dict
    from helpers import make_image_dataset, tiny_config, tiny_sdxl_models

    data = make_image_dataset(tmp_path, n=4)
    cfg = tiny_config(data, tmp_path / "out")
    cfg.optim_target = "lora_sdxl"
    trainer = Trainer(cfg, tmp_path / "out" / "run",
                      models=tiny_sdxl_models(), tokenizer=HashTokenizer())
    assert trainer.resolutions["text_encoder_2"].any_trainable
    metrics = trainer.fit(max_steps_override=2)
    assert np.isfinite(float(metrics["train_loss"]))

    ckpts = sorted((tmp_path / "out" / "run").glob("*.safetensors"))
    assert ckpts
    state = load_state_dict(ckpts[-1])
    assert any(k.startswith("condition_model.encoder_2.") and ".lora_" in k
               for k in state)

    out = tmp_path / "kohya.safetensors"
    res = CliRunner().invoke(ckpt_main,
                             ["lora", str(ckpts[-1]), str(out)])
    assert res.exit_code == 0, res.output
    kohya = load_state_dict(out)
    assert any(k.startswith("lora_te1_") for k in kohya)
    assert any(k.startswith("lora_te2_") for k in kohya)
    assert any(k.startswith("lora_unet_") for k in kohya)
    assert not any(k.startswith("lora_te_") for k in kohya)


def test_non_sdxl_rejects_te2_target(tmp_path):
    from scal_sdt_tpu.conf import Config
    from scal_sdt_tpu.training.optim_targets import resolve_optim_target

    spec = Config({"text_encoder_2": {"targets": [{"index": ["x"]}]}})
    with pytest.raises(ValueError, match="text_encoder_2"):
        resolve_optim_target(spec, ["a"], ["b"])


def test_size_cond_flows_from_dataset_to_batch(tmp_path):
    """Items carry (orig_h, orig_w, top, left); collate emits (B, 4) int32;
    the SDXL step turns it into per-image time_ids."""
    from scal_sdt_tpu.data.datasets import Concept, ImagePromptDataset, Index
    from scal_sdt_tpu.data.pipeline import collate
    from helpers import make_image_dataset

    data = make_image_dataset(tmp_path, n=2, size=(64, 48))  # landscape
    ds = ImagePromptDataset([Concept(str(data), "{TXT_PROMPT}")], seed=1)
    items = [ds[Index(i, (32, 32))] for i in range(2)]
    assert items[0].size_cond is not None
    oh, ow, top, left = items[0].size_cond
    assert (oh, ow) == (48, 64)          # original file size (h, w)
    assert top == 0                      # height is the short side: no slack
    assert 0 <= left <= (round(64 * 32 / 48) - 32)

    batch = collate(items)
    assert batch["size_cond"].shape == (2, 4)
    assert batch["size_cond"].dtype == np.int32


def test_sdxl_step_uses_per_image_size_cond():
    import dataclasses
    from scal_sdt_tpu.training.step import StepSpec, compute_loss
    from helpers import tiny_sdxl_models

    m = tiny_sdxl_models()
    spec = StepSpec(unet_config=m.unet_config, clip_config=m.clip_config,
                    vae_config=m.vae_config, schedule=m.schedule,
                    compute_dtype=jnp.float32, clip2_config=m.clip2_config)
    frozen = {}
    for pre, params in (("unet", m.unet), ("condition_model.encoder", m.clip),
                        ("condition_model.encoder_2", m.clip2), ("vae", m.vae)):
        frozen.update({f"{pre}.{k}": jnp.asarray(v) for k, v in params.items()})
    base = {
        "images": jnp.asarray(
            np.random.RandomState(0).uniform(-1, 1, (2, 32, 32, 3)),
            jnp.float32),
        "input_ids": jnp.asarray(
            np.random.RandomState(1).randint(0, 1000, (2, 77)), jnp.int32),
    }
    rng = jax.random.PRNGKey(0)
    loss_default, _ = compute_loss({}, frozen, dict(base), rng, spec)
    with_sc = dict(base)
    with_sc["size_cond"] = jnp.asarray([[1024, 768, 10, 20],
                                        [512, 512, 0, 0]], jnp.int32)
    loss_sc, _ = compute_loss({}, frozen, with_sc, rng, spec)
    assert np.isfinite(loss_default) and np.isfinite(loss_sc)
    # different micro-conditioning must change the UNet output/loss
    assert abs(float(loss_default) - float(loss_sc)) > 0


def test_sdxl_prune_emits_conditioner_namespace(tmp_path):
    """prune --arch sdxl --text-encoder publishes the WebUI single-file
    layout: UNet + tower 1 (transformers) + tower 2 (OpenCLIP), loadable
    back through load_ldm_checkpoint."""
    from click.testing import CliRunner

    from scal_sdt_tpu.cli.ckpt_tool import main as ckpt_main
    from scal_sdt_tpu.convert.loader import load_ldm_checkpoint
    from scal_sdt_tpu.conf import Config
    from scal_sdt_tpu.utils.state import save_state_dict
    from helpers import tiny_sdxl_models

    m = tiny_sdxl_models(vocab_size=512)
    state = {}
    state.update({f"unet.{k}": np.asarray(v) for k, v in m.unet.items()})
    state.update({f"condition_model.encoder.{k}": np.asarray(v)
                  for k, v in m.clip.items()})
    state.update({f"condition_model.encoder_2.{k}": np.asarray(v)
                  for k, v in m.clip2.items()})
    ckpt = tmp_path / "train.safetensors"
    save_state_dict(state, ckpt)

    out = tmp_path / "sdxl_ldm.safetensors"
    res = CliRunner().invoke(ckpt_main, [
        "prune", str(ckpt), str(out), "--text-encoder",
        "--text-encoder-dtype", "fp32"])
    assert res.exit_code == 0, res.output

    from scal_sdt_tpu.utils.state import load_state_dict
    ldm = load_state_dict(out)
    assert any(k.startswith("conditioner.embedders.0.transformer.") for k in ldm)
    assert any(k.startswith("conditioner.embedders.1.model.transformer.resblocks.")
               for k in ldm)
    assert "conditioner.embedders.1.model.text_projection" in ldm
    assert any(k.startswith("model.diffusion_model.label_emb.") for k in ldm)

    # loads back through the SDXL single-file path (VAE supplied separately:
    # trainable-only checkpoints never carry the frozen VAE)
    from scal_sdt_tpu.convert.sd_names import convert_vae_state_df_to_ldm
    vae_file = tmp_path / "vae.safetensors"
    save_state_dict({f"first_stage_model.{k}": np.asarray(v) for k, v in
                     convert_vae_state_df_to_ldm(m.vae, m.vae_config).items()},
                    vae_file)
    sgm = Config({"model": {"params": {
        "network_config": {"params": {
            "adm_in_channels": 80, "num_classes": "sequential",
            "in_channels": 4, "out_channels": 4, "model_channels": 32,
            "attention_resolutions": [2], "num_res_blocks": 1,
            "channel_mult": [1, 2], "num_head_channels": 16,
            "use_linear_in_transformer": True,
            "transformer_depth": [1, 2], "context_dim": 64,
            "num_groups": 8, "addition_time_embed_dim": 8}},
        "first_stage_config": {"params": {"ddconfig": {
            "ch": m.vae_config.block_out_channels[0], "in_channels": 3,
            "out_ch": 3, "z_channels": m.vae_config.latent_channels,
            "ch_mult": [c // m.vae_config.block_out_channels[0]
                        for c in m.vae_config.block_out_channels],
            "num_res_blocks": m.vae_config.layers_per_block,
            "num_groups": m.vae_config.norm_num_groups}}}}}})
    loaded = load_ldm_checkpoint(out, sgm, vae_path=str(vae_file))
    assert loaded.is_sdxl
    np.testing.assert_allclose(
        loaded.clip2["text_projection.weight"],
        np.asarray(m.clip2["text_projection.weight"]), rtol=1e-6)
