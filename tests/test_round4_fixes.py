"""Round-4 correctness fixes (ADVICE r3 items).

1. convert_mmdit_state_df_to_sgm decides the continuous-adaLN half-swap
   structurally (2*d vs 6*d head output dim), not by highest-present block
   index — a partial trainable-only checkpoint of blocks 0..k (k < final)
   must pass its 6-chunk norm1_context heads through unswapped.
2. ``prune --layout sgm --text-encoder`` bundles a trained T5 tower as
   text_encoders.t5xxl.transformer.* (previously silently dropped).
3. SD3 single-file load without a bundled VAE raises an actionable error.
4. mmdit_config_from_sgm_state takes a pos_embed_max_size override and
   rejects overrides conflicting with a present sincos buffer.
"""

import dataclasses
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from scal_sdt_tpu.convert.mmdit_names import (
    convert_mmdit_state_df_to_sgm,
    convert_mmdit_state_sgm_to_df,
    mmdit_config_from_sgm_state,
)
from scal_sdt_tpu.models.mmdit import MMDiTConfig, init_mmdit_params
from scal_sdt_tpu.utils.state import load_state_dict, save_state_dict


def _to_np(d):
    return {k: np.asarray(v) for k, v in d.items()}


def _config(num_layers=3) -> MMDiTConfig:
    return MMDiTConfig(sample_size=8, patch_size=2, in_channels=4,
                       out_channels=4, num_layers=num_layers,
                       attention_head_dim=64, num_attention_heads=2,
                       joint_attention_dim=32, pooled_projection_dim=24,
                       pos_embed_max_size=12)


def test_partial_df_to_sgm_does_not_swap_interior_adaln():
    """A trainable-only state of blocks 0..1 of a 3-block model: block 1's
    6-chunk norm1_context head is NOT the continuous final head and must
    copy through unswapped, even though it is the highest block present."""
    config = _config(num_layers=3)
    params = _to_np(init_mmdit_params(jax.random.PRNGKey(0), config))
    partial = {k: v for k, v in params.items()
               if k.startswith(("transformer_blocks.0.",
                                "transformer_blocks.1."))}
    d = config.inner_dim
    w = partial["transformer_blocks.1.norm1_context.linear.weight"]
    assert w.shape[0] == 6 * d  # interior block: AdaLayerNormZero

    sgm = convert_mmdit_state_df_to_sgm(partial)
    np.testing.assert_array_equal(
        sgm["joint_blocks.1.context_block.adaLN_modulation.1.weight"], w)
    np.testing.assert_array_equal(
        sgm["joint_blocks.1.context_block.adaLN_modulation.1.bias"],
        partial["transformer_blocks.1.norm1_context.linear.bias"])


def test_partial_df_to_sgm_still_swaps_true_final_block():
    """When the partial state DOES include the real final (pre_only) block,
    its 2-chunk continuous head still gets the half-swap."""
    config = _config(num_layers=3)
    params = _to_np(init_mmdit_params(jax.random.PRNGKey(1), config))
    partial = {k: v for k, v in params.items()
               if k.startswith("transformer_blocks.2.")}
    d = config.inner_dim
    w = partial["transformer_blocks.2.norm1_context.linear.weight"]
    assert w.shape[0] == 2 * d

    sgm = convert_mmdit_state_df_to_sgm(partial)
    out = sgm["joint_blocks.2.context_block.adaLN_modulation.1.weight"]
    np.testing.assert_array_equal(out[:d], w[d:])
    np.testing.assert_array_equal(out[d:], w[:d])


def test_sgm_to_df_structural_round_trip_of_partial():
    """Round-trip a partial (interior-blocks-only) state through sgm and
    back: must be exactly identity (the old index heuristic corrupted the
    highest block's adaLN)."""
    config = _config(num_layers=4)
    params = _to_np(init_mmdit_params(jax.random.PRNGKey(2), config))
    partial = {k: v for k, v in params.items()
               if k.startswith(("transformer_blocks.0.",
                                "transformer_blocks.1.",
                                "transformer_blocks.2."))}
    sgm = convert_mmdit_state_df_to_sgm(partial)
    back = convert_mmdit_state_sgm_to_df(sgm)
    assert set(back) == set(partial)
    for k, v in partial.items():
        np.testing.assert_array_equal(back[k], v, err_msg=k)


def test_pos_embed_max_size_override_and_conflict():
    config = _config(num_layers=2)
    params = _to_np(init_mmdit_params(jax.random.PRNGKey(3), config))
    sgm = convert_mmdit_state_df_to_sgm(params)

    # buffer present: override must agree or raise
    assert mmdit_config_from_sgm_state(sgm).pos_embed_max_size == 12
    assert mmdit_config_from_sgm_state(
        sgm, pos_embed_max_size=12).pos_embed_max_size == 12
    with pytest.raises(ValueError, match="conflicts"):
        mmdit_config_from_sgm_state(sgm, pos_embed_max_size=24)

    # buffer stripped: override wins; absent override defaults to 192
    stripped = {k: v for k, v in sgm.items() if k != "pos_embed"}
    assert mmdit_config_from_sgm_state(
        stripped, pos_embed_max_size=24).pos_embed_max_size == 24
    assert mmdit_config_from_sgm_state(stripped).pos_embed_max_size == 192


def test_sd3_single_file_without_vae_actionable_error(tmp_path):
    from scal_sdt_tpu.convert.loader import load_ldm_checkpoint

    config = _config(num_layers=2)
    params = _to_np(init_mmdit_params(jax.random.PRNGKey(4), config))
    state = {f"model.diffusion_model.{k}": v
             for k, v in convert_mmdit_state_df_to_sgm(params).items()}
    path = tmp_path / "no_vae.safetensors"
    save_state_dict(state, path)
    with pytest.raises(ValueError, match="no bundled VAE"):
        load_ldm_checkpoint(path)


def test_prune_sgm_bundles_t5_tower(tmp_path):
    """prune --layout sgm --text-encoder maps condition_model.encoder_3.*
    to text_encoders.t5xxl.transformer.* in the published single file."""
    from click.testing import CliRunner

    from scal_sdt_tpu.cli import ckpt_tool
    from scal_sdt_tpu.convert.sd_names import convert_vae_state_df_to_ldm
    from scal_sdt_tpu.models.clip import CLIPTextConfig, init_clip_params
    from scal_sdt_tpu.models.t5 import T5Config, init_t5_params
    from scal_sdt_tpu.models.vae import VAEConfig, init_vae_params

    rng = jax.random.PRNGKey(5)
    r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
    config = _config(num_layers=2)
    mmdit = _to_np(init_mmdit_params(r1, config))
    clip_kwargs = dict(vocab_size=256, hidden_size=16, intermediate_size=32,
                       num_hidden_layers=2, num_attention_heads=2,
                       max_position_embeddings=77, projection_dim=12)
    clip_l = _to_np(init_clip_params(
        r2, CLIPTextConfig(**clip_kwargs, hidden_act="quick_gelu")))
    clip_g = _to_np(init_clip_params(
        r3, CLIPTextConfig(**clip_kwargs, hidden_act="gelu")))
    t5 = _to_np(init_t5_params(r4, T5Config(
        vocab_size=256, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_heads=2, feed_forward_proj="gated-gelu")))
    vae_config = VAEConfig(latent_channels=16, block_out_channels=(16, 32),
                           layers_per_block=1, norm_num_groups=8,
                           use_quant_conv=False, use_post_quant_conv=False)
    vae = _to_np(init_vae_params(r5, vae_config))

    ckpt_state = {}
    for prefix, d in (("unet.", mmdit),
                      ("condition_model.encoder.", clip_l),
                      ("condition_model.encoder_2.", clip_g),
                      ("condition_model.encoder_3.", t5)):
        for k, v in d.items():
            ckpt_state[prefix + k] = v
    ckpt = tmp_path / "ckpt.safetensors"
    save_state_dict(ckpt_state, ckpt)
    vae_file = tmp_path / "vae.safetensors"
    save_state_dict(
        {f"first_stage_model.{k}": v for k, v in convert_vae_state_df_to_ldm(
            vae, vae_config).items()}, vae_file)

    out = tmp_path / "published.safetensors"
    result = CliRunner().invoke(ckpt_tool.main, [
        "prune", str(ckpt), str(out), "--arch", "sd3", "--layout", "sgm",
        "--unet-dtype", "fp32", "--text-encoder", "--text-encoder-dtype",
        "fp32", "--vae", str(vae_file), "--vae-dtype", "fp32"])
    assert result.exit_code == 0, result.output

    published = load_state_dict(out)
    for k, v in t5.items():
        np.testing.assert_array_equal(
            published[f"text_encoders.t5xxl.transformer.{k}"], v, err_msg=k)
    # and the loader reads the T5 tower back
    from scal_sdt_tpu.convert.loader import load_ldm_checkpoint

    models = load_ldm_checkpoint(out)
    assert models.t5 is not None
    for k, v in t5.items():
        np.testing.assert_array_equal(models.t5[k], v, err_msg=k)
