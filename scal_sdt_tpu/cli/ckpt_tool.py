"""Checkpoint toolchain: prune / lora / graft (reference: ckpt_tool.py).

* ``prune``: training checkpoint -> WebUI-loadable LDM checkpoint with
  per-component dtype control, optional EMA weights, optional VAE / text
  encoder inclusion (reference ckpt_tool.py:71-135).
* ``lora``: LoRA factors -> kohya/AddNet ``lora_unet_*`` / ``lora_te_*``
  format, recovering alpha from the run config when absent (:156-234).
* ``graft``: overwrite selected submodule subtrees of a base model from
  other models per layer-spec (:289-347).

Note on the text-encoder key layout: the reference maps
``condition_model.encoder.text_model.*`` to ``cond_stage_model.transformer.*``
(dropping the ``text_model`` segment, ckpt_tool.py:128), but every original
SD1.x checkpoint — and what WebUI's FrozenCLIPEmbedder state dict expects —
keeps it: ``cond_stage_model.transformer.text_model.*``. We emit the correct
(original-checkpoint) layout.
"""

from __future__ import annotations

import logging
from functools import lru_cache
from pathlib import Path
from typing import Optional

import click
import numpy as np

from ..conf import get_ldm_config, load as conf_load, search_key
from ..convert.sd_names import (
    convert_unet_state_df_to_ldm,
    convert_unet_state_ldm_to_df,
    convert_vae_state_df_to_ldm,
    normalize_df_vae_attention,
)
from ..models.unet import UNetConfig
from ..utils.state import (
    DTYPE_MAP,
    SUPPORTED_FORMATS,
    cast_type,
    load_state_dict,
    replace_prefix,
    save_state_dict,
    where_prefix,
)

logger = logging.getLogger("ckpt-tool")

UNET_CKPT_PREFIX = "unet."
TE_CKPT_PREFIX = "condition_model.encoder."
TE2_CKPT_PREFIX = "condition_model.encoder_2."   # SDXL tower 2
TE3_CKPT_PREFIX = "condition_model.encoder_3."   # SD3 T5 tower
EMA_CKPT_PREFIX = "unet_ema.shadow_params."


def check_overwrite(path: Path, overwrite: bool):
    if path.exists() and not overwrite:
        raise FileExistsError(f"{path} already exists")


@click.group()
def main():
    pass


@main.command()
@click.argument("checkpoint", type=click.Path(exists=True, dir_okay=False, path_type=Path))
@click.argument("output", type=click.Path(path_type=Path))
@click.option("--unet-dtype", type=click.Choice(list(DTYPE_MAP)), default="fp16",
              help="Save UNet weights in this data type.")
@click.option("--text-encoder", is_flag=True, help="Include text encoder weights.")
@click.option("--text-encoder-dtype", type=click.Choice(list(DTYPE_MAP)), default="fp16")
@click.option("--vae", type=click.Path(exists=True, dir_okay=False, path_type=Path),
              help="Include VAE weights from an LDM VAE file or checkpoint containing one.")
@click.option("--df-vae", type=str,
              help="Include VAE weights from a diffusers VAE directory.")
@click.option("--vae-dtype", type=click.Choice(list(DTYPE_MAP)), default="fp32")
@click.option("--overwrite", is_flag=True)
@click.option("--format", "fmt", type=click.Choice(SUPPORTED_FORMATS), default=None)
@click.option("--ema", is_flag=True, help="Use EMA weights.")
@click.option("--pristine-te", type=str, default=None,
              help="Pristine CLIP text-encoder source (diffusers text_encoder "
                   "dir, transformers dir, or weights file) used when the "
                   "checkpoint has no TE weights. Defaults to the local "
                   "transformers cache of openai/clip-vit-large-patch14.")
@click.option("--arch", type=click.Choice(["auto", "sd1", "sd2", "sdxl",
                                           "sd3"]),
              default="auto", show_default=True,
              help="Architecture for the LDM name bijection and the "
                   "text-encoder namespace. 'auto' infers the UNet layout "
                   "from the checkpoint's keys and detects the SD2 OpenCLIP "
                   "tower by width; pass explicitly for partial (e.g. "
                   "KV-only) checkpoints.")
@click.option("--pos-embed-max-size", type=int, default=192, show_default=True,
              help="SD3 sgm layout only: grid size of the synthesized sincos "
                   "pos_embed buffer when the training checkpoint omits it "
                   "(trainable-only checkpoints always do; 192 = SD3-Medium).")
@click.option("--layout", type=click.Choice(["diffusers", "sgm"]),
              default="diffusers", show_default=True,
              help="SD3 output layout: 'diffusers' emits the bare "
                   "SD3Transformer2DModel file (drop into "
                   "<model>/transformer/); 'sgm' emits a WebUI/ComfyUI "
                   "single-file checkpoint (model.diffusion_model.* "
                   "joint_blocks, text_encoders.clip_l/clip_g towers). "
                   "Ignored for SD1/SD2/SDXL (always single-file LDM).")
def prune(checkpoint: Path, output: Path, unet_dtype: str, text_encoder: bool,
          text_encoder_dtype: str, vae: Optional[Path], df_vae: Optional[str],
          vae_dtype: str, overwrite: bool, fmt: Optional[str], ema: bool,
          pristine_te: Optional[str], arch: str, layout: str,
          pos_embed_max_size: int):
    """Convert a training checkpoint for CompVis/StabilityAI LDM codebases."""
    check_overwrite(output, overwrite)
    assert not (vae and df_vae), "Only one of --vae / --df-vae may be given"

    state = load_state_dict(checkpoint)
    ldm_state: dict = {}

    # UNet (EMA shadow keys are relative to the UNet, like the reference's)
    if ema:
        unet_state = replace_prefix(state, EMA_CKPT_PREFIX)
        if not unet_state:
            raise ValueError("Checkpoint has no EMA weights")
    else:
        unet_state = replace_prefix(state, UNET_CKPT_PREFIX)
    unet_state = {k: v for k, v in unet_state.items() if ".lora_" not in k}
    if arch == "sd3" or (arch == "auto"
                         and "pos_embed.proj.weight" in unet_state):
        if layout != "sgm":
            # publish the denoiser in the diffusers transformer/ layout (drop
            # the file into <model>/transformer/diffusion_pytorch_model.safetensors)
            out_state = cast_type(unet_state, unet_dtype)
            save_state_dict(out_state, output, fmt)
            logger.info(f"Saved SD3 transformer ({len(out_state)} tensors, "
                        f"{unet_dtype}) in diffusers layout to {output}")
            return
        # WebUI/ComfyUI SD3 single-file layout: sgm joint_blocks naming under
        # model.diffusion_model.*, text towers (transformers layout) under
        # text_encoders.clip_l/clip_g.transformer.*
        from ..convert.mmdit_names import convert_mmdit_state_df_to_sgm

        if "pos_embed.pos_embed" not in unet_state:
            # the fixed sincos buffer is excluded from training checkpoints
            # (never trainable); real single files carry it, so synthesize
            from ..models.mmdit import sincos_pos_embed_2d

            inner = int(unet_state["pos_embed.proj.weight"].shape[0])
            unet_state["pos_embed.pos_embed"] = sincos_pos_embed_2d(
                inner, pos_embed_max_size)
        sgm = convert_mmdit_state_df_to_sgm(unet_state)
        ldm_state.update(cast_type(
            {f"model.diffusion_model.{k}": v for k, v in sgm.items()},
            unet_dtype))
        if df_vae is not None:
            raise click.UsageError(
                "--df-vae is not supported with --layout sgm for SD3; pass "
                "an LDM-layout VAE file via --vae instead")
        if vae is not None:
            vae_state = load_state_dict(vae)
            from_ldm = where_prefix(vae_state, "first_stage_model.")
            vae_state = (from_ldm if from_ldm
                         else replace_prefix(vae_state, "", "first_stage_model."))
            ldm_state.update(cast_type(vae_state, vae_dtype))
        if text_encoder:
            te1 = replace_prefix(state, TE_CKPT_PREFIX,
                                 "text_encoders.clip_l.transformer.")
            te1 = {k: v for k, v in te1.items() if ".lora_" not in k}
            te2 = replace_prefix(state, TE2_CKPT_PREFIX,
                                 "text_encoders.clip_g.transformer.")
            te2 = {k: v for k, v in te2.items() if ".lora_" not in k}
            if not te1 or not te2:
                logger.warning(
                    "Checkpoint lacks full SD3 text towers (trainable-only "
                    "checkpoints omit frozen components); skipping "
                    "--text-encoder — merge into a full model with `graft`")
            else:
                ldm_state.update(cast_type(te1, text_encoder_dtype))
                ldm_state.update(cast_type(te2, text_encoder_dtype))
                te3 = replace_prefix(state, TE3_CKPT_PREFIX,
                                     "text_encoders.t5xxl.transformer.")
                te3 = {k: v for k, v in te3.items() if ".lora_" not in k}
                if te3:
                    ldm_state.update(cast_type(te3, text_encoder_dtype))
        elif where_prefix(state, TE3_CKPT_PREFIX):
            logger.warning(
                "Checkpoint contains a T5 tower (condition_model.encoder_3.*)"
                " but --text-encoder was not given; it is NOT included in the"
                " published single file")
        save_state_dict(ldm_state, output, fmt)
        logger.info(f"Wrote {len(ldm_state)} tensors (SD3 single-file sgm "
                    f"layout) to {output}")
        return
    from ..convert.sd_names import infer_unet_layout

    user_arch = arch   # the explicit choice also decides the TE namespace
    inferred = infer_unet_layout(unet_state) if arch == "auto" else None
    if inferred is not None:
        # full state: index the bijection by the checkpoint's ACTUAL block
        # structure (SD1.x, SDXL, or miniature models alike)
        map_config = inferred
        arch = "sdxl" if inferred.addition_embed_type == "text_time" else "sd1"
    else:
        # partial (e.g. KV-only) states are structurally ambiguous: fall
        # back to the canonical architecture chosen via --arch
        if arch == "auto":
            arch = "sdxl" if any(
                k.startswith("add_embedding.")
                or k.startswith("mid_block.attentions.0.transformer_blocks.1.")
                for k in unet_state) else "sd1"
        map_config = UNetConfig.sdxl() if arch == "sdxl" else UNetConfig.sd15()
    unet_state = convert_unet_state_df_to_ldm(unet_state, map_config)
    sd2_te = (user_arch == "sd2"
              or (user_arch == "auto" and arch != "sdxl"
                  and _looks_sd2_te(state)))
    unet_state = replace_prefix(unet_state, "", "model.diffusion_model.")
    ldm_state.update(cast_type(unet_state, unet_dtype))

    # VAE
    vae_state = None
    if vae is not None:
        vae_state = load_state_dict(vae)
        from_ldm = where_prefix(vae_state, "first_stage_model.")
        vae_state = from_ldm if from_ldm else replace_prefix(vae_state, "", "first_stage_model.")
    elif df_vae is not None:
        from ..convert.loader import _find_weights_file

        vae_state = normalize_df_vae_attention(
            load_state_dict(_find_weights_file(Path(df_vae))))
        vae_state = convert_vae_state_df_to_ldm(vae_state)
        vae_state = replace_prefix(vae_state, "", "first_stage_model.")
    if vae_state is not None:
        ldm_state.update(cast_type(vae_state, vae_dtype))

    # Text encoder
    if text_encoder and arch == "sdxl":
        # WebUI SDXL single-file layout: tower 1 (transformers layout) under
        # conditioner.embedders.0.transformer, tower 2 converted back to
        # OpenCLIP under conditioner.embedders.1.model
        from ..convert.sd_names import convert_transformers_text_to_openclip

        te1 = replace_prefix(state, TE_CKPT_PREFIX,
                             "conditioner.embedders.0.transformer.")
        te1 = {k: v for k, v in te1.items() if ".lora_" not in k}
        te2 = replace_prefix(state, TE2_CKPT_PREFIX)
        te2 = {k: v for k, v in te2.items() if ".lora_" not in k}
        if not te1 or not te2:
            logger.warning(
                "Checkpoint lacks full SDXL text towers (trainable-only "
                "checkpoints omit frozen components); skipping --text-encoder "
                "— merge into a full model with `graft` instead")
        else:
            ldm_state.update(cast_type(te1, text_encoder_dtype))
            te2 = {f"conditioner.embedders.1.model.{k}": v
                   for k, v in convert_transformers_text_to_openclip(te2).items()}
            ldm_state.update(cast_type(te2, text_encoder_dtype))
    elif text_encoder and sd2_te:
        # SD2.x single-file layout: the text tower lives under
        # cond_stage_model.model.* in OpenCLIP naming (the inverse of what
        # load_ldm_checkpoint converts on the way in)
        from ..convert.sd_names import convert_transformers_text_to_openclip

        te = replace_prefix(state, TE_CKPT_PREFIX)
        te = {k: v for k, v in te.items() if ".lora_" not in k}
        if not te:
            logger.warning("Checkpoint lacks text-encoder weights; skipping "
                           "--text-encoder (merge via `graft` instead)")
        else:
            te = {f"cond_stage_model.model.{k}": v
                  for k, v in convert_transformers_text_to_openclip(te).items()}
            ldm_state.update(cast_type(te, text_encoder_dtype))
    elif text_encoder:
        te_state = replace_prefix(state, TE_CKPT_PREFIX, "cond_stage_model.transformer.")
        te_state = {k: v for k, v in te_state.items() if ".lora_" not in k}
        if not te_state:
            # Reference falls back to pristine CLIP-L when the checkpoint has
            # no TE weights (/root/reference/ckpt_tool.py:128-133).
            te_state = _pristine_clip_state(pristine_te)
            te_state = replace_prefix(te_state, "", "cond_stage_model.transformer.")
            logger.info("Checkpoint has no text-encoder weights; using pristine CLIP-L")
        ldm_state.update(cast_type(te_state, text_encoder_dtype))

    save_state_dict(ldm_state, output, fmt)
    logger.info(f"Wrote {len(ldm_state)} tensors to {output}")


def _looks_sd2_te(state: dict) -> bool:
    """SD2.x text tower heuristic: OpenCLIP-H width (1024) token embedding
    in the checkpoint's text-encoder namespace."""
    tok = state.get(
        TE_CKPT_PREFIX + "text_model.embeddings.token_embedding.weight")
    return tok is not None and int(np.asarray(tok).shape[1]) >= 1024


def _pristine_clip_state(source: Optional[str]) -> dict:
    """Pristine CLIP-L text-model state in transformers naming
    (``text_model.*``), from a local dir/file or the transformers cache.

    Offline stand-in for the reference's
    ``CLIPTextModel.from_pretrained(CLIP_L)`` fallback
    (/root/reference/ckpt_tool.py:128-133)."""
    if source is not None:
        src = Path(source)
        if src.is_dir():
            from ..convert.loader import _find_weights_file

            if (src / "text_encoder").is_dir():
                src = src / "text_encoder"
            state = load_state_dict(_find_weights_file(src))
        else:
            state = load_state_dict(src)
    else:
        try:
            import torch
            from transformers import CLIPTextModel

            model = CLIPTextModel.from_pretrained(
                "openai/clip-vit-large-patch14", local_files_only=True)
            with torch.no_grad():
                state = {k: v.numpy() for k, v in model.state_dict().items()}
        except Exception as e:
            raise click.ClickException(
                "Checkpoint has no text-encoder weights and no pristine CLIP-L "
                "is available offline; pass --pristine-te with a local "
                f"text-encoder dir or weights file ({e})")
    state = {k: v for k, v in state.items()
             if not k.endswith("position_ids") and ".lora_" not in k}
    if not any(k.startswith("text_model.") for k in state):
        state = {f"text_model.{k}": v for k, v in state.items()}
    return state


def to_kohya_format(state: dict, prefix: str, fallback_alpha=None) -> dict:
    """LoRA factor keys -> AddNet naming (reference ckpt_tool.py:185-222)."""
    lora_modules = {k.rsplit(".", 1)[0] for k in state
                    if k.endswith(".lora_A") or k.endswith(".lora_B")}
    key_map = {"lora_A": "lora_down.weight", "lora_B": "lora_up.weight",
               "lora_alpha": "alpha"}
    out = {}
    for module in lora_modules:
        if f"{module}.lora_alpha" not in state and fallback_alpha is not None:
            state[f"{module}.lora_alpha"] = np.asarray(int(fallback_alpha), np.int32)
        for suffix, kohya_key in key_map.items():
            k = f"{module}.{suffix}"
            if k in state:
                name = "_".join([prefix] + module.split("."))
                out[f"{name}.{kohya_key}"] = state[k]
    return out


@main.command("lora")
@click.argument("checkpoint", type=click.Path(exists=True, dir_okay=False, path_type=Path))
@click.argument("output", type=click.Path(path_type=Path))
@click.option("--overwrite", is_flag=True)
@click.option("--format", "fmt", type=click.Choice(SUPPORTED_FORMATS), default=None)
@click.option("--dtype", type=click.Choice(list(DTYPE_MAP)), default="fp16")
@click.option("--unet-naming", type=click.Choice(["auto", "diffusers", "ldm"]),
              default="auto", show_default=True,
              help="UNet module naming in the exported keys. kohya's SD1.x "
                   "LoRAs use diffusers-style names (lora_unet_down_blocks_*) "
                   "but its SDXL LoRAs use sgm/LDM-style "
                   "(lora_unet_input_blocks_*); 'auto' picks by whether the "
                   "checkpoint trains the second text tower.")
def extract_lora_cmd(checkpoint: Path, output: Path, overwrite: bool,
                     fmt: Optional[str], dtype: str, unet_naming: str):
    """Export trained LoRA factors in kohya/AddNet-compatible format."""
    check_overwrite(output, overwrite)

    def get_alpha():
        run_config = checkpoint.parent / "config.yaml"
        if not run_config.exists():
            logger.warning("No run config next to checkpoint; alpha defaults off")
            return None
        from ..conf import load_optim_target

        optim_target = conf_load(run_config).optim_target
        if isinstance(optim_target, str):
            optim_target = load_optim_target(optim_target)
        return next(search_key(optim_target, "lora"), {}).get("alpha")

    state = load_state_dict(checkpoint)
    result = {}
    unet = replace_prefix(state, UNET_CKPT_PREFIX)
    te = replace_prefix(state, TE_CKPT_PREFIX)
    te2 = replace_prefix(state, TE2_CKPT_PREFIX)
    if unet_naming == "auto":
        unet_naming = "ldm" if te2 else "diffusers"
    if unet_naming == "ldm":
        # kohya's SDXL UNet is sgm-style: its LoRA keys flatten LDM module
        # paths (lora_unet_input_blocks_4_1_...). Rename through the same
        # architecture bijection used for checkpoint conversion.
        from ..convert.sd_names import _apply_renames, unet_prefix_map

        pairs = unet_prefix_map(UNetConfig.sdxl())
        unet = {_apply_renames(k, pairs): v for k, v in unet.items()}
    result.update(to_kohya_format(unet, "lora_unet", get_alpha()))
    if te2:
        # kohya SDXL convention: two towers exported as lora_te1_/lora_te2_
        result.update(to_kohya_format(te, "lora_te1", get_alpha()))
        result.update(to_kohya_format(te2, "lora_te2", get_alpha()))
    else:
        result.update(to_kohya_format(te, "lora_te", get_alpha()))

    cast = {k: (v.astype(DTYPE_MAP[dtype])
                if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
            for k, v in result.items()}
    save_state_dict(cast, output, fmt)
    logger.info(f"Wrote {len(cast)} LoRA tensors to {output}")


def load_as_diffusers_state(path: Path, ldm_config_path: Optional[str] = None):
    """(unet_state, clip_state) in diffusers naming, from either layout."""
    path = Path(path)
    if path.is_dir():
        from ..convert.loader import _find_weights_file

        unet_state = load_state_dict(_find_weights_file(path / "unet"))
        clip_state = load_state_dict(_find_weights_file(path / "text_encoder"))
    else:
        state = load_state_dict(path)
        cfg = UNetConfig.from_ldm_config(get_ldm_config(ldm_config_path))
        unet_state = convert_unet_state_ldm_to_df(
            replace_prefix(state, "model.diffusion_model."), cfg)
        clip_state = replace_prefix(state, "cond_stage_model.transformer.")
    clip_state.pop("text_model.embeddings.position_ids", None)
    return unet_state, clip_state


@main.command("graft")
@click.argument("base_model_path", type=click.Path(exists=True, path_type=Path), nargs=1)
@click.argument("model_paths", type=click.Path(exists=True, path_type=Path), nargs=-1)
@click.argument("output_path", type=click.Path(path_type=Path), nargs=1)
@click.option("--layer-spec", type=click.Path(exists=True, path_type=Path), required=True,
              help="Layer specification (see configs/optim_targets).")
@click.option("--overwrite", is_flag=True)
@click.option("--format", "fmt", type=click.Choice(SUPPORTED_FORMATS), default=None)
@click.option("--unet-dtype", type=click.Choice(list(DTYPE_MAP)), default="fp32")
@click.option("--text-encoder-dtype", type=click.Choice(list(DTYPE_MAP)), default="fp32")
@click.option("--lru-cache-size", type=int, default=3)
@click.option("--ldm-config", type=str, default=None)
def graft(base_model_path: Path, model_paths: tuple[Path, ...], output_path: Path,
          layer_spec: Path, overwrite: bool, fmt: Optional[str], unet_dtype: str,
          text_encoder_dtype: str, lru_cache_size: int, ldm_config: Optional[str]):
    """Graft submodule subtrees from other models onto a base model."""
    check_overwrite(output_path, overwrite)
    layer_config = conf_load(layer_spec)

    base_unet, base_clip = load_as_diffusers_state(base_model_path, ldm_config)

    cached_load = lru_cache(maxsize=lru_cache_size)(
        lambda p: load_as_diffusers_state(Path(p), ldm_config))

    for comp_idx, (comp_name, base_state) in enumerate(
            [("unet", base_unet), ("text_encoder", base_clip)]):
        section = layer_config.get(comp_name)
        if section is None:
            continue
        _graft_walk(section.targets, "", base_state, model_paths, cached_load, comp_idx)

    ldm_state = {}
    unet_state = convert_unet_state_df_to_ldm(base_unet)
    unet_state = replace_prefix(unet_state, "", "model.diffusion_model.")
    ldm_state.update(cast_type(unet_state, unet_dtype))
    clip_state = replace_prefix(base_clip, "", "cond_stage_model.transformer.")
    ldm_state.update(cast_type(clip_state, text_encoder_dtype))
    save_state_dict(ldm_state, output_path, fmt)
    logger.info(f"Wrote grafted model ({len(ldm_state)} tensors) to {output_path}")


def _graft_walk(nodes, prefix, base_state, model_paths, cached_load, comp_idx):
    from ..conf import Config

    keys = list(base_state.keys())

    def children(pfx):
        start = pfx + "." if pfx else ""
        seen = {}
        for k in keys:
            if k.startswith(start) and "." in k[len(start):]:
                seen.setdefault(k[len(start):].split(".", 1)[0])
        return list(seen)

    for node in nodes:
        node = node if isinstance(node, Config) else Config(node or {})
        index = node.get("index")
        targets = node.get("targets")
        selected = children(prefix) if index is None else list(index)
        for path in selected:
            sub = f"{prefix}.{path}" if prefix else path
            if targets is not None:
                _graft_walk(targets, sub, base_state, model_paths, cached_load, comp_idx)
            else:
                source = node.get("source")
                if source is None:
                    continue
                donor = cached_load(str(model_paths[int(source)]))[comp_idx]
                n = 0
                for k in keys:
                    if k.startswith(sub + "."):
                        base_state[k] = donor[k]
                        n += 1
                logger.info(f"Grafted {sub} ({n} tensors) from model [{source}]")


@main.command("embedding")
@click.argument("checkpoint", type=click.Path(exists=True, dir_okay=False, path_type=Path))
@click.argument("out_dir", type=click.Path(file_okay=False, path_type=Path))
def embedding(checkpoint: Path, out_dir: Path):
    """Export trained textual-inversion embeddings to a1111-layout
    safetensors (one file per keyword), consumable by WebUI and by this
    framework's own custom_embeddings.path (beyond reference parity)."""
    import numpy as np

    from ..text.ti import TRAINED_EXTRA_KEY, export_embeddings
    from ..training.checkpoint import load_checkpoint_tensors
    from ..training.step import TE_PREFIX

    tensors, meta = load_checkpoint_tensors(checkpoint)
    key = f"{TE_PREFIX}.{TRAINED_EXTRA_KEY}"
    if key not in tensors or not meta.get("ti_tokens"):
        raise click.UsageError(
            f"{checkpoint} contains no trained textual-inversion vectors "
            f"(need tensor {key!r} + ti_tokens metadata)")
    written = export_embeddings(np.asarray(tensors[key]), meta["ti_tokens"],
                                out_dir)
    for p in written:
        logger.info(f"Wrote {p}")


if __name__ == "__main__":
    logging.basicConfig(level="INFO")
    main()
