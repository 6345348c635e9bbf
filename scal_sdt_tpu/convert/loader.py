"""Model loading: original-LDM checkpoint or diffusers directory -> param dicts.

Reference behaviour (``/root/reference/modules/model.py:81-133``): if
``config.model`` is a file, treat it as a CompVis LDM ``.ckpt/.safetensors``
and convert; if a directory (or hub id), treat as diffusers layout. An
external VAE may override the bundled one; CLIP-skip is applied at encode
time (we keep all layers and truncate in the forward instead of dropping
layers at construction — same math, see models/clip.py).

Returns host numpy dicts keyed by our canonical (diffusers) names; the
trainer device-puts them with the mesh sharding rules.
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Optional

import numpy as np

from ..conf import Config, get_ldm_config
from ..diffusion.schedule import NoiseSchedule
from ..models.clip import CLIPTextConfig, clip_param_shapes
from ..models.unet import UNetConfig, unet_param_shapes
from ..models.vae import VAEConfig, vae_param_shapes
from ..utils.state import load_state_dict, replace_prefix, where_prefix
from .sd_names import (
    convert_openclip_text_to_transformers,
    convert_unet_state_ldm_to_df,
    convert_vae_state_ldm_to_df,
    normalize_df_vae_attention,
)

logger = logging.getLogger("loader")


@dataclasses.dataclass
class LoadedModels:
    # `unet` holds the denoiser params — a UNet for SD1/SD2/SDXL, the MMDiT
    # for SD3 (unet_config is None there and mmdit_config is set).
    unet: dict
    unet_config: Optional[UNetConfig]
    vae: dict
    vae_config: VAEConfig
    clip: dict
    clip_config: CLIPTextConfig
    schedule: NoiseSchedule
    # SDXL/SD3 (dual-text-encoder) family: OpenCLIP bigG tower with
    # projection (diffusers text_encoder_2/); None for SD1.x/2.x models.
    clip2: Optional[dict] = None
    clip2_config: Optional[CLIPTextConfig] = None
    # SD3 family: MMDiT architecture + optional T5 tower (text_encoder_3/).
    mmdit_config: Optional[object] = None
    t5: Optional[dict] = None
    t5_config: Optional[object] = None

    @property
    def is_sdxl(self) -> bool:
        return (self.unet_config is not None
                and self.unet_config.addition_embed_type == "text_time")

    @property
    def is_sd3(self) -> bool:
        return self.mmdit_config is not None


def _validate(params: dict, shapes: dict, what: str):
    missing = [k for k in shapes if k not in params]
    if missing:
        raise ValueError(f"{what}: {len(missing)} missing params, e.g. {missing[:5]}")
    bad = [(k, params[k].shape, shapes[k]) for k in shapes
           if tuple(params[k].shape) != tuple(shapes[k])]
    if bad:
        raise ValueError(f"{what}: shape mismatches, e.g. {bad[:3]}")
    extra = [k for k in params if k not in shapes]
    for k in extra:
        del params[k]


def _find_weights_file(d: Path) -> Path:
    for name in ("diffusion_pytorch_model.safetensors", "model.safetensors",
                 "pytorch_model.safetensors", "diffusion_pytorch_model.bin",
                 "pytorch_model.bin", "model.ckpt"):
        if (d / name).exists():
            return d / name
    candidates = [p for p in d.iterdir() if p.suffix in (".safetensors", ".bin", ".ckpt")]
    if candidates:
        return candidates[0]
    raise FileNotFoundError(f"No weights file in {d}")


def _load_df_component_config(d: Path) -> dict:
    cfg = d / "config.json"
    return json.loads(cfg.read_text()) if cfg.exists() else {}


def _unet_config_from_df(cfg: dict) -> UNetConfig:
    if not cfg:
        return UNetConfig.sd15()
    # diffusers quirk: "attention_head_dim" historically holds the HEAD COUNT
    # (int for SD1.x, per-level list for SD2.x)
    heads = cfg.get("num_attention_heads") or cfg.get("attention_head_dim", 8)
    heads = tuple(heads) if isinstance(heads, (list, tuple)) else int(heads)
    return UNetConfig(
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (320, 640, 1280, 1280))),
        layers_per_block=cfg.get("layers_per_block", 2),
        num_attention_heads=heads,
        use_linear_projection=bool(cfg.get("use_linear_projection", False)),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        down_block_types=tuple(cfg.get("down_block_types", UNetConfig.sd15().down_block_types)),
        up_block_types=tuple(cfg.get("up_block_types", UNetConfig.sd15().up_block_types)),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        sample_size=cfg.get("sample_size", 64) or 64,
        transformer_layers_per_block=(
            tuple(t) if isinstance(t := cfg.get("transformer_layers_per_block", 1),
                                   (list, tuple)) else int(t)),
        addition_embed_type=cfg.get("addition_embed_type"),
        addition_time_embed_dim=int(cfg.get("addition_time_embed_dim") or 256),
        projection_class_embeddings_input_dim=cfg.get(
            "projection_class_embeddings_input_dim"),
    )


def _vae_config_from_df(cfg: dict) -> VAEConfig:
    if not cfg:
        return VAEConfig.sd15()
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
        shift_factor=float(cfg.get("shift_factor") or 0.0),
        use_quant_conv=bool(cfg.get("use_quant_conv", True)),
        use_post_quant_conv=bool(cfg.get("use_post_quant_conv", True)),
    )


def _clip_config_from_df(cfg: dict,
                         with_projection: bool = False) -> CLIPTextConfig:
    if not cfg:
        return CLIPTextConfig.vit_l()
    # only CLIPTextModelWithProjection components (SDXL text_encoder_2)
    # carry a used projection head; plain CLIPTextModel configs may still
    # name a projection_dim that has no weights
    projection_dim = (int(cfg["projection_dim"])
                      if with_projection and cfg.get("projection_dim") else None)
    return CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden_size=cfg.get("hidden_size", 768),
        intermediate_size=cfg.get("intermediate_size", 3072),
        num_hidden_layers=cfg.get("num_hidden_layers", 12),
        num_attention_heads=cfg.get("num_attention_heads", 12),
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        projection_dim=projection_dim,
        eos_token_id=int(cfg.get("eos_token_id") or 49407),
    )


def _clip_config_from_state(clip: dict,
                            hidden_act: str = "gelu") -> CLIPTextConfig:
    """Infer the text-encoder config from a converted transformers-layout
    state dict (used for SD2.x/SDXL single-file loads, where no config.json
    exists). Head count follows the OpenCLIP width//64 convention."""
    tok = clip["text_model.embeddings.token_embedding.weight"]
    pos = clip["text_model.embeddings.position_embedding.weight"]
    fc1 = clip["text_model.encoder.layers.0.mlp.fc1.weight"]
    layers = 0
    while f"text_model.encoder.layers.{layers}.layer_norm1.weight" in clip:
        layers += 1
    d = int(tok.shape[1])
    return CLIPTextConfig(
        vocab_size=int(tok.shape[0]), hidden_size=d,
        intermediate_size=int(fc1.shape[0]), num_hidden_layers=layers,
        num_attention_heads=max(d // 64, 1),
        max_position_embeddings=int(pos.shape[0]), hidden_act=hidden_act)


def load_diffusers_dir(path: Path, vae_override: Optional[str] = None) -> LoadedModels:
    path = Path(path)

    # SD3 family: the denoiser lives in transformer/ (MMDiT), not unet/.
    if not (path / "unet").is_dir() and (path / "transformer").is_dir():
        return _load_sd3_diffusers_dir(path, vae_override)

    unet_dir = path / "unet"
    unet_config = _unet_config_from_df(_load_df_component_config(unet_dir))
    unet = load_state_dict(_find_weights_file(unet_dir))

    if vae_override:
        vae_dir = Path(vae_override)
        if not vae_dir.is_dir():
            raise FileNotFoundError(f"VAE override not found: {vae_override}")
    else:
        vae_dir = path / "vae"
    vae_config = _vae_config_from_df(_load_df_component_config(vae_dir))
    vae = normalize_df_vae_attention(load_state_dict(_find_weights_file(vae_dir)))

    te_dir = path / "text_encoder"
    clip_config = _clip_config_from_df(_load_df_component_config(te_dir))
    clip = load_state_dict(_find_weights_file(te_dir))
    clip.pop("text_model.embeddings.position_ids", None)

    # SDXL: second text tower (OpenCLIP bigG as CLIPTextModelWithProjection)
    clip2 = clip2_config = None
    te2_dir = path / "text_encoder_2"
    if te2_dir.is_dir():
        clip2_config = _clip_config_from_df(_load_df_component_config(te2_dir),
                                            with_projection=True)
        clip2 = load_state_dict(_find_weights_file(te2_dir))
        clip2.pop("text_model.embeddings.position_ids", None)

    sched_file = path / "scheduler" / "scheduler_config.json"
    schedule = (NoiseSchedule.from_diffusers_scheduler_config(json.loads(sched_file.read_text()))
                if sched_file.exists() else NoiseSchedule())

    _validate(unet, unet_param_shapes(unet_config), "unet")
    _validate(vae, vae_param_shapes(vae_config), "vae")
    _validate(clip, clip_param_shapes(clip_config), "text_encoder")
    if clip2 is not None:
        _validate(clip2, clip_param_shapes(clip2_config), "text_encoder_2")
    if unet_config.addition_embed_type == "text_time":
        if clip2 is None:
            raise ValueError(
                "SDXL UNet (addition_embed_type=text_time) requires a "
                "text_encoder_2/ directory with the pooled-projection tower")
        if clip2_config.projection_dim is None:
            raise ValueError(
                "text_encoder_2 has no projection head (projection_dim "
                "missing from its config.json / no text_projection.weight): "
                "the SDXL text_time conditioning needs the pooled projected "
                "embedding")
    return LoadedModels(unet, unet_config, vae, vae_config, clip, clip_config,
                        schedule, clip2=clip2, clip2_config=clip2_config)


def _load_sd3_diffusers_dir(path: Path,
                            vae_override: Optional[str]) -> LoadedModels:
    """SD3-family diffusers dir: transformer/ (MMDiT) + 16-ch VAE + dual
    projected CLIP towers + optional text_encoder_3/ (T5). Third model
    family — beyond the torch reference's SD1.x scope entirely."""
    from ..diffusion.flow import FlowSchedule
    from ..models.mmdit import (
        MMDiTConfig, mmdit_param_shapes, sincos_pos_embed_2d,
    )
    from ..models.t5 import T5Config, t5_param_shapes

    tr_dir = path / "transformer"
    mmdit_config = MMDiTConfig.from_json(_load_df_component_config(tr_dir))
    mmdit = load_state_dict(_find_weights_file(tr_dir))
    if "pos_embed.pos_embed" not in mmdit:
        # non-persistent buffer in some exports; it is a fixed sincos table
        mmdit["pos_embed.pos_embed"] = sincos_pos_embed_2d(
            mmdit_config.inner_dim, mmdit_config.pos_embed_max_size)

    vae_dir = Path(vae_override) if vae_override else path / "vae"
    vae_config = _vae_config_from_df(_load_df_component_config(vae_dir))
    vae = normalize_df_vae_attention(load_state_dict(_find_weights_file(vae_dir)))

    clips = []
    for sub in ("text_encoder", "text_encoder_2"):
        d = path / sub
        cfg = _clip_config_from_df(_load_df_component_config(d),
                                   with_projection=True)
        st = load_state_dict(_find_weights_file(d))
        st.pop("text_model.embeddings.position_ids", None)
        if cfg.projection_dim is None:
            raise ValueError(f"SD3 {sub} must carry a text_projection head")
        clips.append((st, cfg))

    t5 = t5_config = None
    te3_dir = path / "text_encoder_3"
    if te3_dir.is_dir():
        t5_config = T5Config.from_json(_load_df_component_config(te3_dir))
        t5 = load_state_dict(_find_weights_file(te3_dir))
        _validate(t5, t5_param_shapes(t5_config), "text_encoder_3")

    sched_file = path / "scheduler" / "scheduler_config.json"
    schedule = (FlowSchedule.from_diffusers_scheduler_config(
        json.loads(sched_file.read_text()))
        if sched_file.exists() else FlowSchedule())

    _validate(mmdit, mmdit_param_shapes(mmdit_config), "transformer")
    _validate(vae, vae_param_shapes(vae_config), "vae")
    _validate(clips[0][0], clip_param_shapes(clips[0][1]), "text_encoder")
    _validate(clips[1][0], clip_param_shapes(clips[1][1]), "text_encoder_2")
    return LoadedModels(mmdit, None, vae, vae_config,
                        clips[0][0], clips[0][1], schedule,
                        clip2=clips[1][0], clip2_config=clips[1][1],
                        mmdit_config=mmdit_config, t5=t5, t5_config=t5_config)


def _vae_config_from_ldm_state(vae_ldm: dict) -> VAEConfig:
    """Infer the VAE architecture from an LDM-layout first-stage state dict
    (single-file checkpoints carry no component config.json). SD3's
    16-channel VAE is recognised by its latent width and its missing 1x1
    quant convs."""
    cin = int(np.asarray(vae_ldm["encoder.conv_in.weight"]).shape[1])
    ch = []
    while f"encoder.down.{len(ch)}.block.0.conv1.weight" in vae_ldm:
        ch.append(int(np.asarray(
            vae_ldm[f"encoder.down.{len(ch)}.block.0.conv1.weight"]).shape[0]))
    layers = 0
    while f"encoder.down.0.block.{layers}.conv1.weight" in vae_ldm:
        layers += 1
    z = int(np.asarray(vae_ldm["encoder.conv_out.weight"]).shape[0]) // 2
    cout = int(np.asarray(vae_ldm["decoder.conv_out.weight"]).shape[0])
    sd3like = z == 16
    return VAEConfig(
        in_channels=cin, out_channels=cout, latent_channels=z,
        block_out_channels=tuple(ch), layers_per_block=layers,
        norm_num_groups=next(g for g in (32, 8, 4, 1) if ch[0] % g == 0),
        scaling_factor=1.5305 if sd3like else 0.18215,
        shift_factor=0.0609 if sd3like else 0.0,
        use_quant_conv="quant_conv.weight" in vae_ldm,
        use_post_quant_conv="post_quant_conv.weight" in vae_ldm,
    )


def _t5_config_from_state(t5: dict):
    """Infer T5Config from a transformers-layout encoder state dict."""
    from ..models.t5 import T5Config

    shared = np.asarray(t5["shared.weight"])
    layers = 0
    while f"encoder.block.{layers}.layer.0.SelfAttention.q.weight" in t5:
        layers += 1
    rel = np.asarray(
        t5["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])
    heads = int(rel.shape[1])
    inner = int(np.asarray(
        t5["encoder.block.0.layer.0.SelfAttention.q.weight"]).shape[0])
    gated = "encoder.block.0.layer.1.DenseReluDense.wi_0.weight" in t5
    ff_key = ("encoder.block.0.layer.1.DenseReluDense.wi_0.weight" if gated
              else "encoder.block.0.layer.1.DenseReluDense.wi.weight")
    return T5Config(
        vocab_size=int(shared.shape[0]), d_model=int(shared.shape[1]),
        d_kv=inner // heads, d_ff=int(np.asarray(t5[ff_key]).shape[0]),
        num_layers=layers, num_heads=heads,
        relative_attention_num_buckets=int(rel.shape[0]),
        feed_forward_proj="gated-gelu" if gated else "relu")


def _load_sd3_single_file(state: dict,
                          vae_path: Optional[str] = None,
                          head_dim: int = 64,
                          pos_embed_max_size: Optional[int] = None) -> LoadedModels:
    """SD3/SD3.5 single-file checkpoint (WebUI/ComfyUI distribution): MMDiT
    under ``model.diffusion_model.*`` (sgm joint_blocks naming), text towers
    under ``text_encoders.{clip_l,clip_g,t5xxl}.transformer.*`` (transformers
    layout), 16-channel VAE under ``first_stage_model.*``. Beyond-reference
    capability (the reference is SD1.x-only)."""
    from ..diffusion.flow import FlowSchedule
    from ..models.mmdit import mmdit_param_shapes
    from ..models.t5 import t5_param_shapes
    from .mmdit_names import (
        convert_mmdit_state_sgm_to_df, mmdit_config_from_sgm_state,
    )

    sgm = replace_prefix(state, "model.diffusion_model.")
    mmdit_config = mmdit_config_from_sgm_state(
        sgm, head_dim=head_dim, pos_embed_max_size=pos_embed_max_size)
    mmdit = convert_mmdit_state_sgm_to_df(sgm)
    if "pos_embed.pos_embed" not in mmdit:
        # fixed sincos buffer, non-persistent in some exports
        from ..models.mmdit import sincos_pos_embed_2d

        mmdit["pos_embed.pos_embed"] = sincos_pos_embed_2d(
            mmdit_config.inner_dim, mmdit_config.pos_embed_max_size)

    if vae_path is not None:
        vae_state = load_state_dict(Path(vae_path))
        vae_ldm = replace_prefix(vae_state, "first_stage_model.") or vae_state
    else:
        vae_ldm = replace_prefix(state, "first_stage_model.")
    if not vae_ldm:
        raise ValueError(
            "SD3 single-file checkpoint has no bundled VAE "
            "(first_stage_model.*); pass one via --vae / config.vae")
    vae_config = _vae_config_from_ldm_state(vae_ldm)
    vae = convert_vae_state_ldm_to_df(vae_ldm, vae_config)

    clips = []
    for tower, act in (("clip_l", "quick_gelu"), ("clip_g", "gelu")):
        st = replace_prefix(state, f"text_encoders.{tower}.transformer.")
        if not st:
            raise ValueError(
                f"SD3 single-file checkpoint has no bundled {tower} tower "
                "(text_encoders.*): use the incl-clips distribution or the "
                "diffusers directory layout")
        st.pop("text_model.embeddings.position_ids", None)
        proj = st.get("text_projection.weight")
        if proj is None:
            raise ValueError(f"SD3 {tower} tower is missing text_projection "
                             "(the pooled conditioning needs it)")
        cfg = dataclasses.replace(_clip_config_from_state(st, hidden_act=act),
                                  projection_dim=int(proj.shape[0]))
        clips.append((st, cfg))

    t5 = t5_config = None
    t5_state = replace_prefix(state, "text_encoders.t5xxl.transformer.")
    if t5_state:
        t5_config = _t5_config_from_state(t5_state)
        _validate(t5_state, t5_param_shapes(t5_config), "t5xxl")
        t5 = t5_state

    _validate(mmdit, mmdit_param_shapes(mmdit_config), "transformer")
    _validate(vae, vae_param_shapes(vae_config), "vae")
    _validate(clips[0][0], clip_param_shapes(clips[0][1]), "clip_l")
    _validate(clips[1][0], clip_param_shapes(clips[1][1]), "clip_g")
    return LoadedModels(mmdit, None, vae, vae_config,
                        clips[0][0], clips[0][1], FlowSchedule(),
                        clip2=clips[1][0], clip2_config=clips[1][1],
                        mmdit_config=mmdit_config, t5=t5, t5_config=t5_config)


def _load_sdxl_single_file(state: dict,
                           ldm_config: Optional[Config] = None,
                           vae_path: Optional[str] = None) -> LoadedModels:
    """WebUI-style SDXL single-file checkpoint (sgm namespace): UNet under
    ``model.diffusion_model.*`` (SDXL-base architecture), text towers under
    ``conditioner.embedders.0.transformer.*`` (CLIP-L, transformers layout)
    and ``conditioner.embedders.1.model.*`` (OpenCLIP bigG with
    text_projection). Beyond-reference capability (the reference is SD1.x
    only, /root/reference/modules/convert/sd_to_diffusers.py:583-586)."""
    has_sgm_yaml = (ldm_config is not None
                    and "network_config" in ldm_config.model.params)
    unet_config = (UNetConfig.from_sgm_config(ldm_config) if has_sgm_yaml
                   else UNetConfig.sdxl())
    unet = convert_unet_state_ldm_to_df(
        replace_prefix(state, "model.diffusion_model."), unet_config)

    vae_config = dataclasses.replace(
        VAEConfig.from_ldm_config(ldm_config) if has_sgm_yaml
        else VAEConfig.sd15(),
        scaling_factor=0.13025)
    if vae_path is not None:
        vae_state = load_state_dict(Path(vae_path))
        vae_ldm = replace_prefix(vae_state, "first_stage_model.") or vae_state
    else:
        vae_ldm = replace_prefix(state, "first_stage_model.")
    vae = convert_vae_state_ldm_to_df(vae_ldm, vae_config)

    clip = replace_prefix(state, "conditioner.embedders.0.transformer.")
    clip.pop("text_model.embeddings.position_ids", None)
    # real SDXL ships the standard CLIP-L here; infer (quick_gelu family)
    # only when the tower deviates from ViT-L shapes
    clip_config = CLIPTextConfig.vit_l()
    if ("text_model.encoder.layers."
            f"{clip_config.num_hidden_layers - 1}.layer_norm1.weight") not in clip:
        clip_config = _clip_config_from_state(clip, hidden_act="quick_gelu")

    clip2 = convert_openclip_text_to_transformers(
        replace_prefix(state, "conditioner.embedders.1.model."),
        keep_projection=True)
    proj = clip2.get("text_projection.weight")
    if proj is None:
        raise ValueError("SDXL single-file checkpoint is missing the tower-2 "
                         "text_projection")
    clip2_config = dataclasses.replace(
        _clip_config_from_state(clip2), projection_dim=int(proj.shape[0]))

    schedule = NoiseSchedule()  # SDXL-base trains the SD default schedule

    _validate(unet, unet_param_shapes(unet_config), "unet")
    _validate(vae, vae_param_shapes(vae_config), "vae")
    _validate(clip, clip_param_shapes(clip_config), "text_encoder")
    _validate(clip2, clip_param_shapes(clip2_config), "text_encoder_2")
    return LoadedModels(unet, unet_config, vae, vae_config, clip, clip_config,
                        schedule, clip2=clip2, clip2_config=clip2_config)


def load_ldm_checkpoint(path: Path, ldm_config: Optional[Config] = None,
                        vae_path: Optional[str] = None,
                        mmdit_head_dim: int = 64,
                        mmdit_pos_embed_max_size: Optional[int] = None) -> LoadedModels:
    """Original-LDM single-file checkpoint (reference modules/model.py:96-123)."""
    state = load_state_dict(Path(path))
    if any(k.startswith("model.diffusion_model.joint_blocks.") for k in state):
        return _load_sd3_single_file(state, vae_path, head_dim=mmdit_head_dim,
                                     pos_embed_max_size=mmdit_pos_embed_max_size)
    if any(k.startswith("conditioner.embedders.1.model.") for k in state):
        return _load_sdxl_single_file(state, ldm_config, vae_path)
    ldm_config = ldm_config if ldm_config is not None else get_ldm_config(None)

    unet_config = UNetConfig.from_ldm_config(ldm_config)
    unet_ldm = replace_prefix(state, "model.diffusion_model.")
    unet = convert_unet_state_ldm_to_df(unet_ldm, unet_config)

    vae_config = VAEConfig.from_ldm_config(ldm_config)
    if vae_path is not None:
        vae_state = load_state_dict(Path(vae_path))
        vae_ldm = replace_prefix(vae_state, "first_stage_model.")
        if not vae_ldm:
            vae_ldm = vae_state
    else:
        vae_ldm = replace_prefix(state, "first_stage_model.")
    vae = convert_vae_state_ldm_to_df(vae_ldm, vae_config)

    openclip = replace_prefix(state, "cond_stage_model.model.")
    if openclip:
        # SD2.x single-file layout: the text tower is OpenCLIP ViT-H
        # (resblocks + fused in_proj). Beyond-reference capability — the
        # reference's converter handles the SD1 CLIP layout only
        # (/root/reference/modules/convert/sd_to_diffusers.py:583-586).
        clip = convert_openclip_text_to_transformers(openclip)
        clip_config = _clip_config_from_state(clip)
    else:
        clip = replace_prefix(state, "cond_stage_model.transformer.")
        clip.pop("text_model.embeddings.position_ids", None)
        # SD1.x bundles ViT-L (quick_gelu): shape inference reproduces
        # CLIPTextConfig.vit_l() exactly for real checkpoints while also
        # accepting deviating towers (miniature fixtures, community mixes)
        clip_config = (_clip_config_from_state(clip, hidden_act="quick_gelu")
                       if clip else CLIPTextConfig.vit_l())

    schedule = NoiseSchedule.from_ldm_config(ldm_config)

    _validate(unet, unet_param_shapes(unet_config), "unet")
    _validate(vae, vae_param_shapes(vae_config), "vae")
    _validate(clip, clip_param_shapes(clip_config), "text_encoder")
    return LoadedModels(unet, unet_config, vae, vae_config, clip, clip_config, schedule)


def _resolve_hub_id(name: str) -> Path:
    """HF hub id -> local diffusers directory (reference modules/model.py:81-93
    passes hub ids straight to ``from_pretrained``). Resolution order:
    1. the local HF cache (``snapshot_download(local_files_only=True)``) —
       works fully offline when the model was ever downloaded before;
    2. a network download when egress exists.
    Raises an actionable error naming both failures otherwise."""
    if "/" not in name or name.startswith((".", "/")):
        raise FileNotFoundError(
            f"Model '{name}' not found locally and is not a hub id "
            "(expected 'org/name')")
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover - hub ships with transformers
        raise FileNotFoundError(
            f"Model '{name}' not found locally and huggingface_hub is not "
            "installed") from e
    try:
        return Path(snapshot_download(name, local_files_only=True))
    except Exception:
        pass
    try:
        return Path(snapshot_download(name))
    except Exception as e:
        raise FileNotFoundError(
            f"Model '{name}' is neither a local path, nor in the local HF "
            f"cache, nor downloadable ({type(e).__name__}: {e}) — pass a "
            "local diffusers directory or LDM file instead") from e


def load_components(config: Config) -> LoadedModels:
    """Dispatch on config.model like the reference (modules/model.py:126-133).

    An optional ``schedule:`` config section overrides fields of the loaded
    noise schedule (e.g. ``prediction_type: v`` +
    ``rescale_zero_terminal_snr: true`` to fine-tune an epsilon model into
    a zero-terminal-SNR v-prediction one, arXiv:2305.08891)."""
    name = config.model
    if name is None:
        raise ValueError("config.model is not set")
    p = Path(str(name))
    if p.is_file():
        pe = config.get("mmdit_pos_embed_max_size")
        models = load_ldm_checkpoint(p, get_ldm_config(config.get("ldm_config")),
                                     config.get("vae"),
                                     mmdit_head_dim=int(
                                         config.get("mmdit_head_dim") or 64),
                                     mmdit_pos_embed_max_size=(
                                         int(pe) if pe else None))
    elif p.is_dir():
        models = load_diffusers_dir(p, config.get("vae"))
    else:
        models = load_diffusers_dir(
            _resolve_hub_id(str(name)), config.get("vae"))

    overrides = dict(config.get("schedule") or {})
    if overrides:
        import dataclasses

        models = dataclasses.replace(
            models, schedule=dataclasses.replace(models.schedule, **overrides))
    return models
