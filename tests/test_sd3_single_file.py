"""SD3 single-file (sgm-layout) checkpoint support.

WebUI/ComfyUI-distributed SD3/SD3.5 files store the MMDiT as
``model.diffusion_model.joint_blocks.*`` (fused qkv, adaLN_modulation heads)
with text towers under ``text_encoders.*`` — the layout the torch reference
cannot read at all (it is SD1.x-only,
/root/reference/modules/convert/sd_to_diffusers.py:583-586). Covers the
bijection (convert/mmdit_names.py), the loader dispatch, the VAE
quant-conv-less SD3 layout, and the ``prune --layout sgm`` publishing
round-trip.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from scal_sdt_tpu.convert.loader import load_ldm_checkpoint
from scal_sdt_tpu.convert.mmdit_names import (
    convert_mmdit_state_df_to_sgm,
    convert_mmdit_state_sgm_to_df,
    mmdit_config_from_sgm_state,
)
from scal_sdt_tpu.convert.sd_names import convert_vae_state_df_to_ldm
from scal_sdt_tpu.models.clip import CLIPTextConfig, init_clip_params
from scal_sdt_tpu.models.mmdit import MMDiTConfig, init_mmdit_params, mmdit_apply
from scal_sdt_tpu.models.t5 import T5Config, init_t5_params
from scal_sdt_tpu.models.vae import VAEConfig, init_vae_params, vae_param_shapes
from scal_sdt_tpu.utils.state import save_state_dict


def _to_np(d):
    return {k: np.asarray(v) for k, v in d.items()}


def _sgm_friendly_config(qk_norm=None) -> MMDiTConfig:
    # head_dim 64 so the single-file config inference (which cannot see the
    # head split) reconstructs the architecture exactly
    return MMDiTConfig(sample_size=8, patch_size=2, in_channels=4,
                       out_channels=4, num_layers=2, attention_head_dim=64,
                       num_attention_heads=2, joint_attention_dim=32,
                       pooled_projection_dim=24, pos_embed_max_size=12,
                       qk_norm=qk_norm)


@pytest.mark.parametrize("qk_norm", [None, "rms_norm"])
def test_mmdit_sgm_round_trip_exact(qk_norm):
    config = _sgm_friendly_config(qk_norm)
    params = _to_np(init_mmdit_params(jax.random.PRNGKey(0), config))
    sgm = convert_mmdit_state_df_to_sgm(params)
    # sgm layout fuses each qkv triple and has no 'transformer_blocks'
    assert "joint_blocks.0.x_block.attn.qkv.weight" in sgm
    assert sgm["joint_blocks.0.x_block.attn.qkv.weight"].shape == (
        3 * config.inner_dim, config.inner_dim)
    assert not any("transformer_blocks" in k for k in sgm)
    if qk_norm:
        assert "joint_blocks.0.x_block.attn.ln_q.weight" in sgm
    # final context block is pre_only: no proj / mlp, 2-chunk adaLN
    assert "joint_blocks.1.context_block.attn.proj.weight" not in sgm
    assert "joint_blocks.1.context_block.mlp.fc1.weight" not in sgm
    assert sgm["joint_blocks.1.context_block.adaLN_modulation.1.weight"].shape[0] == \
        2 * config.inner_dim

    back = convert_mmdit_state_sgm_to_df(sgm)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(back[k], params[k], err_msg=k)

    inferred = mmdit_config_from_sgm_state(sgm)
    assert inferred == config or (
        # sample_size is not recoverable from shapes; everything else must be
        inferred == MMDiTConfig(**{
            **config.__dict__, "sample_size": inferred.sample_size}))


def test_swap_scale_shift_is_semantic_not_identity():
    """The two continuous adaLN heads store [shift, scale] in sgm vs
    [scale, shift] in diffusers (convert_sd3_to_diffusers.swap_scale_shift);
    the bijection must swap them, not copy."""
    config = _sgm_friendly_config()
    params = _to_np(init_mmdit_params(jax.random.PRNGKey(1), config))
    sgm = convert_mmdit_state_df_to_sgm(params)
    d = config.inner_dim
    w_df = params["norm_out.linear.weight"]
    w_sgm = sgm["final_layer.adaLN_modulation.1.weight"]
    np.testing.assert_array_equal(w_sgm[:d], w_df[d:])   # sgm shift = df shift
    np.testing.assert_array_equal(w_sgm[d:], w_df[:d])
    w2_df = params["transformer_blocks.1.norm1_context.linear.weight"]
    w2_sgm = sgm["joint_blocks.1.context_block.adaLN_modulation.1.weight"]
    np.testing.assert_array_equal(w2_sgm[:d], w2_df[d:])
    # the non-final (6-chunk adaLN-zero) heads copy straight through
    np.testing.assert_array_equal(
        sgm["joint_blocks.0.context_block.adaLN_modulation.1.weight"],
        params["transformer_blocks.0.norm1_context.linear.weight"])


def test_dual_attention_round_trip_and_inference():
    """SD3.5-Medium (MMDiT-X) dual-attention blocks: 9-chunk adaLN + fused
    attn2.qkv survive the sgm round trip; block indices are inferred."""
    import dataclasses

    config = dataclasses.replace(_sgm_friendly_config("rms_norm"),
                                 num_layers=3, dual_attention_layers=(0, 1))
    params = _to_np(init_mmdit_params(jax.random.PRNGKey(2), config))
    sgm = convert_mmdit_state_df_to_sgm(params)
    d = config.inner_dim
    assert sgm["joint_blocks.0.x_block.attn2.qkv.weight"].shape == (3 * d, d)
    assert sgm["joint_blocks.0.x_block.adaLN_modulation.1.weight"].shape == (9 * d, d)
    assert sgm["joint_blocks.2.x_block.adaLN_modulation.1.weight"].shape == (6 * d, d)
    assert "joint_blocks.0.x_block.attn2.ln_q.weight" in sgm
    assert "joint_blocks.2.x_block.attn2.qkv.weight" not in sgm

    back = convert_mmdit_state_sgm_to_df(sgm)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(back[k], params[k], err_msg=k)
    inferred = mmdit_config_from_sgm_state(sgm)
    assert inferred.dual_attention_layers == (0, 1)
    assert inferred.qk_norm == "rms_norm"


def _build_single_file(tmp_path, with_t5: bool, qk_norm=None):
    """Assemble a synthetic SD3 single-file checkpoint in the distribution
    layout and return (path, originals dict)."""
    rng = jax.random.PRNGKey(7)
    r1, r2, r3, r4, r5 = jax.random.split(rng, 5)

    mmdit_config = _sgm_friendly_config(qk_norm)
    mmdit = _to_np(init_mmdit_params(r1, mmdit_config))

    # SD3-style VAE: 16 latent channels, no quant convs
    vae_config = VAEConfig(latent_channels=16, block_out_channels=(16, 32),
                           layers_per_block=1, norm_num_groups=8,
                           scaling_factor=1.5305, shift_factor=0.0609,
                           use_quant_conv=False, use_post_quant_conv=False)
    vae = _to_np(init_vae_params(r2, vae_config))
    assert "quant_conv.weight" not in vae

    clip_kwargs = dict(vocab_size=256, hidden_size=16, intermediate_size=32,
                       num_hidden_layers=2, num_attention_heads=2,
                       max_position_embeddings=77, projection_dim=12)
    clip_l_config = CLIPTextConfig(**clip_kwargs, hidden_act="quick_gelu")
    clip_g_config = CLIPTextConfig(**clip_kwargs, hidden_act="gelu")
    clip_l = _to_np(init_clip_params(r3, clip_l_config))
    clip_g = _to_np(init_clip_params(r4, clip_g_config))

    t5_config = T5Config(vocab_size=256, d_model=32, d_kv=8, d_ff=48,
                         num_layers=2, num_heads=2,
                         feed_forward_proj="gated-gelu")
    t5 = _to_np(init_t5_params(r5, t5_config)) if with_t5 else None

    state = {}
    for k, v in convert_mmdit_state_df_to_sgm(mmdit).items():
        state[f"model.diffusion_model.{k}"] = v
    for k, v in convert_vae_state_df_to_ldm(vae, vae_config).items():
        state[f"first_stage_model.{k}"] = v
    for k, v in clip_l.items():
        state[f"text_encoders.clip_l.transformer.{k}"] = v
    for k, v in clip_g.items():
        state[f"text_encoders.clip_g.transformer.{k}"] = v
    if t5 is not None:
        for k, v in t5.items():
            state[f"text_encoders.t5xxl.transformer.{k}"] = v

    path = tmp_path / "sd3_incl_clips.safetensors"
    save_state_dict(state, path)
    return path, dict(mmdit=mmdit, mmdit_config=mmdit_config, vae=vae,
                      vae_config=vae_config, clip_l=clip_l, clip_g=clip_g,
                      t5=t5, t5_config=t5_config)


@pytest.mark.parametrize("with_t5", [False, True])
def test_sd3_single_file_loads(tmp_path, with_t5):
    path, orig = _build_single_file(tmp_path, with_t5)
    models = load_ldm_checkpoint(path)

    assert models.is_sd3
    assert models.mmdit_config == orig["mmdit_config"] or \
        models.mmdit_config.num_layers == orig["mmdit_config"].num_layers
    for k, v in orig["mmdit"].items():
        np.testing.assert_array_equal(models.unet[k], v, err_msg=k)
    for k, v in orig["vae"].items():
        np.testing.assert_array_equal(models.vae[k], v, err_msg=k)
    assert models.vae_config.latent_channels == 16
    assert not models.vae_config.use_quant_conv
    assert abs(models.vae_config.scaling_factor - 1.5305) < 1e-9
    assert models.clip_config.projection_dim == 12
    assert models.clip2_config.projection_dim == 12
    assert models.clip_config.hidden_act == "quick_gelu"
    assert models.clip2_config.hidden_act == "gelu"
    assert models.schedule.prediction_type == "flow"
    if with_t5:
        assert models.t5 is not None
        assert models.t5_config == orig["t5_config"]
    else:
        assert models.t5 is None

    # forward parity: loaded params + inferred config reproduce the original
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    t = np.array([500.0], np.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 32))
    pooled = jax.random.normal(jax.random.PRNGKey(5), (1, 24))
    out_orig = mmdit_apply(orig["mmdit"], x, t, ctx, pooled,
                           orig["mmdit_config"])
    out_loaded = mmdit_apply(models.unet, x, t, ctx, pooled,
                             models.mmdit_config)
    np.testing.assert_allclose(np.asarray(out_loaded), np.asarray(out_orig),
                               rtol=0, atol=0)


def test_sd3_single_file_missing_towers_errors(tmp_path):
    path, _ = _build_single_file(tmp_path, with_t5=False)
    from scal_sdt_tpu.utils.state import load_state_dict

    state = {k: v for k, v in load_state_dict(path).items()
             if not k.startswith("text_encoders.")}
    bare = tmp_path / "sd3_bare.safetensors"
    save_state_dict(state, bare)
    with pytest.raises(ValueError, match="incl-clips|diffusers"):
        load_ldm_checkpoint(bare)


def test_sd3_vae_encode_decode_without_quant_convs():
    from scal_sdt_tpu.models.vae import decoder_apply, encoder_apply

    config = VAEConfig(latent_channels=16, block_out_channels=(16, 32),
                       layers_per_block=1, norm_num_groups=8,
                       use_quant_conv=False, use_post_quant_conv=False)
    params = init_vae_params(jax.random.PRNGKey(0), config)
    assert "quant_conv.weight" not in vae_param_shapes(config)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    moments = encoder_apply(params, img, config)
    assert moments.shape == (1, 8, 8, 32)   # 2 * latent_channels
    rec = decoder_apply(params, moments[..., :16], config)
    assert rec.shape == (1, 16, 16, 3)


def test_prune_sgm_layout_round_trip(tmp_path):
    """Training checkpoint -> prune --layout sgm -> load_ldm_checkpoint
    recovers the exact MMDiT and text towers."""
    from click.testing import CliRunner

    from scal_sdt_tpu.cli import ckpt_tool

    path, orig = _build_single_file(tmp_path, with_t5=False)
    # synthesize a training checkpoint namespace from the originals
    ckpt_state = {}
    for k, v in orig["mmdit"].items():
        ckpt_state[f"unet.{k}"] = v
    for k, v in orig["clip_l"].items():
        ckpt_state[f"condition_model.encoder.{k}"] = v
    for k, v in orig["clip_g"].items():
        ckpt_state[f"condition_model.encoder_2.{k}"] = v
    ckpt = tmp_path / "train_ckpt.safetensors"
    save_state_dict(ckpt_state, ckpt)

    vae_file = tmp_path / "vae.safetensors"
    save_state_dict(
        {f"first_stage_model.{k}": v for k, v in convert_vae_state_df_to_ldm(
            orig["vae"], orig["vae_config"]).items()}, vae_file)

    out = tmp_path / "published_sgm.safetensors"
    result = CliRunner().invoke(ckpt_tool.main, [
        "prune", str(ckpt), str(out), "--arch", "sd3", "--layout", "sgm",
        "--unet-dtype", "fp32", "--text-encoder",
        "--text-encoder-dtype", "fp32",
        "--vae", str(vae_file), "--vae-dtype", "fp32"])
    assert result.exit_code == 0, result.output

    models = load_ldm_checkpoint(out)
    assert models.is_sd3
    for k, v in orig["mmdit"].items():
        np.testing.assert_array_equal(models.unet[k], v, err_msg=k)
    for k, v in orig["clip_l"].items():
        np.testing.assert_array_equal(models.clip[k], v, err_msg=k)
    for k, v in orig["clip_g"].items():
        np.testing.assert_array_equal(models.clip2[k], v, err_msg=k)
    for k, v in orig["vae"].items():
        np.testing.assert_array_equal(models.vae[k], v, err_msg=k)
