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


# ---------------------------------------------------------------------------
# SD2.x single-file LDM loading (OpenCLIP text tower) — round 3.
# Beyond-reference: the reference's converter handles the SD1 CLIP layout only
# (/root/reference/modules/convert/sd_to_diffusers.py:583-586).
# ---------------------------------------------------------------------------

def _fuse_to_openclip(clip: dict, n_layers: int) -> dict:
    """transformers CLIPText layout -> OpenCLIP text-tower layout (the
    inverse of convert_openclip_text_to_transformers), for synthesis."""
    out = {
        "token_embedding.weight": clip["text_model.embeddings.token_embedding.weight"],
        "positional_embedding": clip["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": clip["text_model.final_layer_norm.weight"],
        "ln_final.bias": clip["text_model.final_layer_norm.bias"],
        "logit_scale": np.zeros((), np.float32),
        "text_projection": np.zeros_like(
            clip["text_model.embeddings.token_embedding.weight"].T),
    }
    for i in range(n_layers):
        src = f"text_model.encoder.layers.{i}"
        dst = f"transformer.resblocks.{i}"
        for kind in ("weight", "bias"):
            out[f"{dst}.attn.in_proj_{kind}"] = np.concatenate([
                np.asarray(clip[f"{src}.self_attn.{p}_proj.{kind}"])
                for p in ("q", "k", "v")], axis=0)
            out[f"{dst}.attn.out_proj.{kind}"] = clip[f"{src}.self_attn.out_proj.{kind}"]
            out[f"{dst}.ln_1.{kind}"] = clip[f"{src}.layer_norm1.{kind}"]
            out[f"{dst}.ln_2.{kind}"] = clip[f"{src}.layer_norm2.{kind}"]
            out[f"{dst}.mlp.c_fc.{kind}"] = clip[f"{src}.mlp.fc1.{kind}"]
            out[f"{dst}.mlp.c_proj.{kind}"] = clip[f"{src}.mlp.fc2.{kind}"]
    return out


def _tiny_sd2_clip():
    from scal_sdt_tpu.models.clip import CLIPTextConfig, init_clip_params

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=128, intermediate_size=256,
                         num_hidden_layers=2, num_attention_heads=2,
                         max_position_embeddings=77, hidden_act="gelu")
    params = {k: np.asarray(v)
              for k, v in init_clip_params(jax.random.PRNGKey(3), cfg).items()}
    return cfg, params


def test_openclip_text_conversion_roundtrip():
    from scal_sdt_tpu.convert.loader import _clip_config_from_state
    from scal_sdt_tpu.convert.sd_names import convert_openclip_text_to_transformers

    cfg, params = _tiny_sd2_clip()
    openclip = _fuse_to_openclip(params, cfg.num_hidden_layers)
    back = convert_openclip_text_to_transformers(openclip)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(back[k], params[k], err_msg=k)
    inferred = _clip_config_from_state(back)
    assert inferred.hidden_size == 128
    assert inferred.num_hidden_layers == 2
    assert inferred.num_attention_heads == 2  # width // 64
    assert inferred.hidden_act == "gelu"


def test_openclip_24_resblocks_drop_last():
    """A full ViT-H tower (24 resblocks) converts to the 23-layer diffusers
    text encoder — SD2 conditions on the penultimate layer."""
    from scal_sdt_tpu.convert.sd_names import convert_openclip_text_to_transformers

    d, m = 8, 16
    state = {
        "token_embedding.weight": np.zeros((10, d), np.float32),
        "positional_embedding": np.zeros((77, d), np.float32),
        "ln_final.weight": np.ones((d,), np.float32),
        "ln_final.bias": np.zeros((d,), np.float32),
    }
    for i in range(24):
        pre = f"transformer.resblocks.{i}"
        state[f"{pre}.attn.in_proj_weight"] = np.zeros((3 * d, d), np.float32)
        state[f"{pre}.attn.in_proj_bias"] = np.zeros((3 * d,), np.float32)
        state[f"{pre}.attn.out_proj.weight"] = np.zeros((d, d), np.float32)
        state[f"{pre}.attn.out_proj.bias"] = np.zeros((d,), np.float32)
        for ln in ("ln_1", "ln_2"):
            state[f"{pre}.{ln}.weight"] = np.ones((d,), np.float32)
            state[f"{pre}.{ln}.bias"] = np.zeros((d,), np.float32)
        state[f"{pre}.mlp.c_fc.weight"] = np.zeros((m, d), np.float32)
        state[f"{pre}.mlp.c_fc.bias"] = np.zeros((m,), np.float32)
        state[f"{pre}.mlp.c_proj.weight"] = np.zeros((d, m), np.float32)
        state[f"{pre}.mlp.c_proj.bias"] = np.zeros((d,), np.float32)
    out = convert_openclip_text_to_transformers(state)
    assert "text_model.encoder.layers.22.layer_norm1.weight" in out
    assert "text_model.encoder.layers.23.layer_norm1.weight" not in out


def test_sd2_single_file_ldm_loads_and_encodes(tmp_path):
    """A synthetic SD2-shaped LDM .safetensors (UNet + VAE + OpenCLIP text
    tower) loads through load_ldm_checkpoint and the text encoder runs."""
    from scal_sdt_tpu.conf import Config
    from scal_sdt_tpu.convert.loader import load_ldm_checkpoint
    from scal_sdt_tpu.convert.sd_names import (
        convert_unet_state_df_to_ldm, convert_vae_state_df_to_ldm)
    from scal_sdt_tpu.models.clip import clip_text_apply
    from scal_sdt_tpu.models.unet import init_unet_params
    from scal_sdt_tpu.models.vae import VAEConfig, init_vae_params
    from scal_sdt_tpu.utils.state import save_state_dict

    ldm_yaml = Config({"model": {"params": {
        "timesteps": 1000,
        "unet_config": {"params": {
            "model_channels": 32, "channel_mult": [1, 2], "num_res_blocks": 1,
            "in_channels": 4, "out_channels": 4, "attention_resolutions": [1],
            "context_dim": 128, "num_head_channels": 16,
            "use_linear_in_transformer": True,
        }},
        "first_stage_config": {"params": {"ddconfig": {
            "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
            "in_channels": 3, "out_ch": 3, "z_channels": 4,
        }}},
    }}})
    unet_cfg = UNetConfig.from_ldm_config(ldm_yaml)
    assert unet_cfg.use_linear_projection  # SD2 signature honoured
    vae_cfg = VAEConfig.from_ldm_config(ldm_yaml)
    unet_df = {k: np.asarray(v) for k, v in
               init_unet_params(jax.random.PRNGKey(0), unet_cfg).items()}
    vae_df = {k: np.asarray(v) for k, v in
              init_vae_params(jax.random.PRNGKey(1), vae_cfg).items()}
    clip_cfg, clip_tf = _tiny_sd2_clip()

    state = {}
    for k, v in convert_unet_state_df_to_ldm(unet_df, unet_cfg).items():
        state[f"model.diffusion_model.{k}"] = v
    for k, v in convert_vae_state_df_to_ldm(vae_df, vae_cfg).items():
        state[f"first_stage_model.{k}"] = v
    for k, v in _fuse_to_openclip(clip_tf, clip_cfg.num_hidden_layers).items():
        state[f"cond_stage_model.model.{k}"] = v
    ckpt = tmp_path / "sd2.safetensors"
    save_state_dict(state, ckpt)

    models = load_ldm_checkpoint(ckpt, ldm_yaml)
    assert models.clip_config.hidden_act == "gelu"
    assert models.clip_config.hidden_size == 128
    assert models.unet_config.num_attention_heads == (2, 4)

    ids = jnp.zeros((1, 77), jnp.int32)
    params = {k: jnp.asarray(v) for k, v in models.clip.items()}
    # loaded weights run AND match the pre-conversion tower exactly
    got = clip_text_apply(params, ids, models.clip_config, stop_at_layer=1)
    want = clip_text_apply({k: jnp.asarray(v) for k, v in clip_tf.items()},
                           ids, clip_cfg, stop_at_layer=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sd2_prune_emits_openclip_namespace(tmp_path):
    """prune --text-encoder on an SD2-width checkpoint publishes the tower
    under cond_stage_model.model.* in OpenCLIP naming, and it loads back
    through the SD2 single-file path."""
    import numpy as np
    from click.testing import CliRunner

    import jax
    from scal_sdt_tpu.cli.ckpt_tool import main as ckpt_main
    from scal_sdt_tpu.convert.sd_names import (
        convert_openclip_text_to_transformers)
    from scal_sdt_tpu.models.clip import CLIPTextConfig, init_clip_params
    from scal_sdt_tpu.models.unet import UNetConfig, init_unet_params
    from scal_sdt_tpu.utils.state import load_state_dict, save_state_dict

    te_cfg = CLIPTextConfig(vocab_size=100, hidden_size=1024,
                            intermediate_size=128, num_hidden_layers=2,
                            num_attention_heads=16, hidden_act="gelu")
    te = {k: np.asarray(v) for k, v in
          init_clip_params(jax.random.PRNGKey(0), te_cfg).items()}
    unet = {k: np.asarray(v) for k, v in
            init_unet_params(jax.random.PRNGKey(1), UNetConfig.tiny()).items()}
    state = {f"unet.{k}": v for k, v in unet.items()}
    state.update({f"condition_model.encoder.{k}": v for k, v in te.items()})
    ckpt = tmp_path / "train.safetensors"
    save_state_dict(state, ckpt)

    out = tmp_path / "sd2_ldm.safetensors"
    res = CliRunner().invoke(ckpt_main, [
        "prune", str(ckpt), str(out), "--text-encoder",
        "--text-encoder-dtype", "fp32"])
    assert res.exit_code == 0, res.output

    ldm = load_state_dict(out)
    assert any(k.startswith("cond_stage_model.model.transformer.resblocks.")
               for k in ldm)
    assert not any(k.startswith("cond_stage_model.transformer.") for k in ldm)
    # tower converts back losslessly
    oc = {k[len("cond_stage_model.model."):]: v for k, v in ldm.items()
          if k.startswith("cond_stage_model.model.")}
    back = convert_openclip_text_to_transformers(oc)
    for k in te:
        np.testing.assert_array_equal(back[k], te[k])
