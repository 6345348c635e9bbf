"""Bidirectional tensor-name mapping between CompVis-LDM and diffusers layouts.

Replaces the reference's pair of hand-maintained converters
(``/root/reference/modules/convert/diffusers_to_sd.py`` and
``sd_to_diffusers.py``) with ONE architecture-driven bijection: for SD1.x
models the two layouts differ only by a deterministic renaming (plus a 2D<->4D
reshape on the VAE mid-attention projections), so both directions derive from
a single name map generated from the model configs. Unlike the reference's
hardcoded 4-block/2-layer loops, the map generalises over
``UNetConfig``/``VAEConfig``.

LDM checkpoints prefix these names with ``model.diffusion_model.`` (UNet),
``first_stage_model.`` (VAE) and ``cond_stage_model.transformer.`` (CLIP);
prefix handling lives in the callers (ckpt tools / loader).

Output byte-compatibility: ``ckpt_tool prune`` uses exactly this map, so the
emitted LDM checkpoints carry the same key set as the reference's (verified
by tests against the known SD1.5 key inventory).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from ..models.unet import UNetConfig
from ..models.vae import VAEConfig

_RESNET_RENAMES = [
    ("norm1", "in_layers.0"),
    ("conv1", "in_layers.2"),
    ("norm2", "out_layers.0"),
    ("conv2", "out_layers.3"),
    ("time_emb_proj", "emb_layers.1"),
    ("conv_shortcut", "skip_connection"),
]

# VAE attention leaf names: ours (modern diffusers) -> LDM
_VAE_ATTN_RENAMES = [
    ("group_norm", "norm"),
    ("to_q", "q"),
    ("to_k", "k"),
    ("to_v", "v"),
    ("to_out.0", "proj_out"),
]


def unet_prefix_map(config: UNetConfig) -> list[tuple[str, str]]:
    """(diffusers_prefix, ldm_prefix) pairs; longest-match rename."""
    pairs = [
        ("time_embedding.linear_1.", "time_embed.0."),
        ("time_embedding.linear_2.", "time_embed.2."),
        ("conv_in.", "input_blocks.0.0."),
        ("conv_norm_out.", "out.0."),
        ("conv_out.", "out.2."),
    ]
    if config.addition_embed_type == "text_time":
        # SDXL micro-conditioning MLP lives under label_emb in the LDM layout
        pairs += [("add_embedding.linear_1.", "label_emb.0.0."),
                  ("add_embedding.linear_2.", "label_emb.0.2.")]
    n_blocks = len(config.block_out_channels)
    lpb = config.layers_per_block

    ldm_idx = 1
    for i, btype in enumerate(config.down_block_types):
        has_attn = btype == "CrossAttnDownBlock2D"
        for j in range(lpb):
            pairs.append((f"down_blocks.{i}.resnets.{j}.", f"input_blocks.{ldm_idx}.0."))
            if has_attn:
                pairs.append((f"down_blocks.{i}.attentions.{j}.", f"input_blocks.{ldm_idx}.1."))
            ldm_idx += 1
        if i != n_blocks - 1:
            pairs.append((f"down_blocks.{i}.downsamplers.0.conv.", f"input_blocks.{ldm_idx}.0.op."))
            ldm_idx += 1

    pairs.append(("mid_block.resnets.0.", "middle_block.0."))
    pairs.append(("mid_block.attentions.0.", "middle_block.1."))
    pairs.append(("mid_block.resnets.1.", "middle_block.2."))

    ldm_idx = 0
    for i, btype in enumerate(config.up_block_types):
        has_attn = btype == "CrossAttnUpBlock2D"
        for j in range(lpb + 1):
            pairs.append((f"up_blocks.{i}.resnets.{j}.", f"output_blocks.{ldm_idx}.0."))
            if has_attn:
                pairs.append((f"up_blocks.{i}.attentions.{j}.", f"output_blocks.{ldm_idx}.1."))
            if j == lpb and i != n_blocks - 1:
                # upsampler shares the last output block; its sub-index depends
                # on whether an attention module precedes it.
                sub = 2 if has_attn else 1
                pairs.append((f"up_blocks.{i}.upsamplers.0.", f"output_blocks.{ldm_idx}.{sub}."))
            ldm_idx += 1
    return pairs


def vae_prefix_map(config: VAEConfig) -> list[tuple[str, str]]:
    pairs = [
        ("encoder.conv_in.", "encoder.conv_in."),
        ("encoder.conv_norm_out.", "encoder.norm_out."),
        ("encoder.conv_out.", "encoder.conv_out."),
        ("decoder.conv_in.", "decoder.conv_in."),
        ("decoder.conv_norm_out.", "decoder.norm_out."),
        ("decoder.conv_out.", "decoder.conv_out."),
        ("quant_conv.", "quant_conv."),
        ("post_quant_conv.", "post_quant_conv."),
    ]
    n = len(config.block_out_channels)
    for i in range(n):
        for j in range(config.layers_per_block):
            pairs.append((f"encoder.down_blocks.{i}.resnets.{j}.", f"encoder.down.{i}.block.{j}."))
        if i != n - 1:
            pairs.append((f"encoder.down_blocks.{i}.downsamplers.0.", f"encoder.down.{i}.downsample."))
        for j in range(config.layers_per_block + 1):
            pairs.append((f"decoder.up_blocks.{i}.resnets.{j}.", f"decoder.up.{n - 1 - i}.block.{j}."))
        if i != n - 1:
            pairs.append((f"decoder.up_blocks.{i}.upsamplers.0.", f"decoder.up.{n - 1 - i}.upsample."))
    for enc_dec in ("encoder", "decoder"):
        pairs.append((f"{enc_dec}.mid_block.resnets.0.", f"{enc_dec}.mid.block_1."))
        pairs.append((f"{enc_dec}.mid_block.resnets.1.", f"{enc_dec}.mid.block_2."))
        pairs.append((f"{enc_dec}.mid_block.attentions.0.", f"{enc_dec}.mid.attn_1."))
    return pairs


def _apply_renames(name: str, renames: list[tuple[str, str]], reverse: bool = False) -> str:
    for a, b in renames:
        src, dst = (b, a) if reverse else (a, b)
        name = name.replace(src, dst)
    return name


def _build_name_map(prefix_pairs: list[tuple[str, str]], df_names: Iterable[str],
                    unet_resnets: bool) -> dict[str, str]:
    """df name -> ldm name for every given diffusers-layout key.

    Internal renames are gated on the *original* diffusers path so e.g. a
    transformer block's 'norm1' is never rewritten (it only renames inside
    '.resnets.' / VAE '.attentions.' modules).
    """
    out = {}
    for name in df_names:
        new = name
        for df_p, ldm_p in prefix_pairs:
            if new.startswith(df_p):
                new = ldm_p + new[len(df_p):]
                break
        if ".resnets." in name:
            if unet_resnets:
                new = _apply_renames(new, _RESNET_RENAMES)
            else:
                new = new.replace("conv_shortcut", "nin_shortcut")
        if not unet_resnets and ".attentions." in name:
            new = _apply_renames(new, _VAE_ATTN_RENAMES)
        out[name] = new
    return out


def infer_unet_layout(df_names: Iterable[str]):
    """Infer the block structure a diffusers-named UNet state actually has
    (levels, layers_per_block, per-level attention, text_time embedding) so
    the LDM bijection indexes correctly for ANY architecture — SD1.x (4
    levels), SDXL (3 levels, add_embedding), or miniature test models.
    Returns None for partial states (no resnet keys): the structure is then
    ambiguous and a canonical config must be chosen by the caller."""
    import re

    names = list(df_names)
    down_levels: dict[int, int] = {}
    down_attn: set[int] = set()
    up_levels: dict[int, int] = {}
    up_attn: set[int] = set()
    for n in names:
        m = re.match(r"down_blocks\.(\d+)\.resnets\.(\d+)\.", n)
        if m:
            i, j = int(m.group(1)), int(m.group(2))
            down_levels[i] = max(down_levels.get(i, 0), j + 1)
        if re.match(r"down_blocks\.(\d+)\.attentions\.", n):
            down_attn.add(int(n.split(".")[1]))
        m = re.match(r"up_blocks\.(\d+)\.resnets\.(\d+)\.", n)
        if m:
            i, j = int(m.group(1)), int(m.group(2))
            up_levels[i] = max(up_levels.get(i, 0), j + 1)
        if re.match(r"up_blocks\.(\d+)\.attentions\.", n):
            up_attn.add(int(n.split(".")[1]))
    if not down_levels or not up_levels:
        return None
    n_levels = max(down_levels) + 1
    lpb = max(down_levels.values())
    return UNetConfig(
        block_out_channels=tuple(320 for _ in range(n_levels)),  # unused by the map
        layers_per_block=lpb,
        down_block_types=tuple(
            "CrossAttnDownBlock2D" if i in down_attn else "DownBlock2D"
            for i in range(n_levels)),
        up_block_types=tuple(
            "CrossAttnUpBlock2D" if i in up_attn else "UpBlock2D"
            for i in range(max(up_levels) + 1)),
        addition_embed_type=("text_time" if any(
            n.startswith("add_embedding.") for n in names) else None),
        projection_class_embeddings_input_dim=1,  # unused by the map
    )


def unet_name_map(config: UNetConfig, df_names: Iterable[str]) -> dict[str, str]:
    return _build_name_map(unet_prefix_map(config), df_names, unet_resnets=True)


def vae_name_map(config: VAEConfig, df_names: Iterable[str]) -> dict[str, str]:
    return _build_name_map(vae_prefix_map(config), df_names, unet_resnets=False)


def _maybe_names(state_or_names) -> list[str]:
    return list(state_or_names.keys()) if hasattr(state_or_names, "keys") else list(state_or_names)


def convert_unet_state_df_to_ldm(state: dict, config: UNetConfig = UNetConfig.sd15()) -> dict:
    """Diffusers-layout UNet state -> LDM names (reference
    diffusers_to_sd.convert_unet_state_dict)."""
    name_map = unet_name_map(config, state.keys())
    return {name_map[k]: v for k, v in state.items()}


def split_fused_qkv(state: dict, num_head_channels: int = 8) -> dict:
    """Normalize legacy CompVis AttentionBlock tensors in an LDM UNet state.

    Very old CompVis checkpoints store spatial attention as a single fused
    ``<block>.qkv.{weight,bias}`` (1x1 conv, head-interleaved q/k/v rows) plus
    a conv ``proj_out``. The reference splits these per-head and converts the
    1-D convs to linears (``/root/reference/modules/convert/sd_to_diffusers.py:124-172``).
    Same math here: reshape to (heads, 3*ch_per_head, ...), split the second
    axis into thirds, flatten back.
    """
    out = {}
    for k, v in state.items():
        if k.endswith("qkv.weight") or k.endswith("qkv.bias"):
            arr = np.asarray(v)
            three_c = arr.shape[0]
            channels = three_c // 3
            num_heads = three_c // num_head_channels // 3
            per_head = channels // num_heads
            interleaved = arr.reshape((num_heads, 3 * per_head) + arr.shape[1:])
            q = interleaved[:, :per_head]
            kk = interleaved[:, per_head:2 * per_head]
            vv = interleaved[:, 2 * per_head:]
            target = (-1, channels) if arr.ndim == 3 else (-1,)
            base = k[: -len("qkv.weight")] if k.endswith(".weight") else k[: -len("qkv.bias")]
            leaf = "weight" if k.endswith(".weight") else "bias"
            out[f"{base}q.{leaf}"] = q.reshape(target)
            out[f"{base}k.{leaf}"] = kk.reshape(target)
            out[f"{base}v.{leaf}"] = vv.reshape(target)
        elif k.endswith("proj_out.weight") and np.asarray(v).ndim == 3:
            # conv1d projection -> linear (reference :156-158)
            out[k] = np.asarray(v)[:, :, 0]
        else:
            out[k] = v
    return out


def convert_unet_state_ldm_to_df(state: dict, config: UNetConfig = UNetConfig.sd15(),
                                 strict: bool = True) -> dict:
    """LDM-layout UNet state (already stripped of 'model.diffusion_model.')
    -> diffusers names.

    ``strict`` raises on keys the map does not consume (instead of silently
    loading an incomplete model) — e.g. a legacy AttentionBlock checkpoint
    whose architecture doesn't match ``config``."""
    from ..models.unet import unet_param_shapes

    state = split_fused_qkv(state)
    df_names = unet_param_shapes(config).keys()
    name_map = unet_name_map(config, df_names)
    inverse = {v: k for k, v in name_map.items()}
    out = {}
    unconsumed = []
    for k, v in state.items():
        if k in inverse:
            out[inverse[k]] = v
        else:
            unconsumed.append(k)
    if strict and unconsumed:
        preview = ", ".join(sorted(unconsumed)[:8])
        raise ValueError(
            f"LDM UNet state has {len(unconsumed)} keys not consumed by the "
            f"{type(config).__name__} layout (first: {preview}). The checkpoint "
            f"architecture does not match; refusing to load it incomplete.")
    return out


def convert_vae_state_df_to_ldm(state: dict, config: VAEConfig = VAEConfig.sd15()) -> dict:
    """Diffusers-layout VAE -> LDM names + the 2D->4D reshape of the
    mid-attention projections (LDM stores them as 1x1 convs)."""
    name_map = vae_name_map(config, state.keys())
    out = {}
    for k, v in state.items():
        new = name_map[k]
        if "attn_1" in new and new.endswith(".weight") and np.asarray(v).ndim == 2:
            v = np.asarray(v).reshape(*v.shape, 1, 1)
        out[new] = v
    return out


def convert_vae_state_ldm_to_df(state: dict, config: VAEConfig = VAEConfig.sd15(),
                                strict: bool = True) -> dict:
    from ..models.vae import vae_param_shapes

    df_names = vae_param_shapes(config).keys()
    name_map = vae_name_map(config, df_names)
    inverse = {v: k for k, v in name_map.items()}
    out = {}
    unconsumed = []
    for k, v in state.items():
        if k not in inverse:
            # standalone first-stage checkpoints ship LPIPS/discriminator
            # training state the reference never reads
            if not k.startswith(("loss.", "model_ema.")):
                unconsumed.append(k)
            continue
        new = inverse[k]
        # conv-attn -> linear (reference conv_attn_to_linear,
        # sd_to_diffusers.py:163-172): 1x1-conv q/k/v/proj squeeze to 2D
        if "attentions" in new and new.endswith(".weight") and np.asarray(v).ndim == 4:
            v = np.asarray(v).reshape(v.shape[0], v.shape[1])
        out[new] = v
    if strict and unconsumed:
        preview = ", ".join(sorted(unconsumed)[:8])
        raise ValueError(
            f"LDM VAE state has {len(unconsumed)} keys not consumed by the "
            f"{type(config).__name__} layout (first: {preview}); refusing to "
            f"load it incomplete.")
    return out


def normalize_df_vae_attention(state: dict) -> dict:
    """Normalize legacy diffusers VAE attention names (query/key/value/
    proj_attn) to the modern to_q/to_k/to_v/to_out.0 used internally."""
    renames = {
        ".query.": ".to_q.", ".key.": ".to_k.", ".value.": ".to_v.",
        ".proj_attn.": ".to_out.0.",
    }
    out = {}
    for k, v in state.items():
        for old, new in renames.items():
            if old in k and "attentions" in k:
                k = k.replace(old, new)
                if k.endswith(".weight") and np.asarray(v).ndim > 2:
                    v = np.asarray(v).reshape(v.shape[0], v.shape[1])
                break
        out[k] = v
    return out


def convert_transformers_text_to_openclip(state: dict) -> dict:
    """Inverse of ``convert_openclip_text_to_transformers`` (sans the
    ViT-H penultimate-drop): transformers CLIP layout -> OpenCLIP
    (resblocks, fused ``attn.in_proj``, ``text_projection`` stored as the
    ``x @ proj`` matrix). Used to publish SDXL tower 2 into the WebUI
    single-file ``conditioner.embedders.1.model.*`` namespace."""
    import re

    out: dict = {}
    renames = [("layer_norm1.", "ln_1."), ("layer_norm2.", "ln_2."),
               ("mlp.fc1.", "mlp.c_fc."), ("mlp.fc2.", "mlp.c_proj."),
               ("self_attn.out_proj.", "attn.out_proj.")]
    layers: dict[int, dict] = {}
    for k, v in state.items():
        m = re.match(r"text_model\.encoder\.layers\.(\d+)\.(.+)$", k)
        if m:
            layers.setdefault(int(m.group(1)), {})[m.group(2)] = np.asarray(v)
    for i, leaves in layers.items():
        pre = f"transformer.resblocks.{i}."
        for kind in ("weight", "bias"):
            out[pre + f"attn.in_proj_{kind}"] = np.concatenate(
                [leaves[f"self_attn.q_proj.{kind}"],
                 leaves[f"self_attn.k_proj.{kind}"],
                 leaves[f"self_attn.v_proj.{kind}"]], axis=0)
        for leaf, v in leaves.items():
            if leaf.startswith(("self_attn.q_proj", "self_attn.k_proj",
                                "self_attn.v_proj")):
                continue
            for new, old in renames:
                if leaf.startswith(new):
                    leaf = old + leaf.removeprefix(new)
                    break
            out[pre + leaf] = v
    top = {
        "text_model.embeddings.token_embedding.weight": "token_embedding.weight",
        "text_model.embeddings.position_embedding.weight": "positional_embedding",
        "text_model.final_layer_norm.weight": "ln_final.weight",
        "text_model.final_layer_norm.bias": "ln_final.bias",
    }
    for src, dst in top.items():
        if src in state:
            out[dst] = np.asarray(state[src])
    if "text_projection.weight" in state:
        out["text_projection"] = np.ascontiguousarray(
            np.asarray(state["text_projection.weight"]).T)
    return out


def convert_openclip_text_to_transformers(state: dict,
                                          keep_projection: bool = False) -> dict:
    """OpenCLIP text-tower state (SD2.x single-file ``cond_stage_model.model.*``,
    already prefix-stripped) -> transformers ``CLIPTextModel`` layout.

    The reference cannot load these at all (its converter handles the SD1
    CLIP layout only, ``/root/reference/modules/convert/sd_to_diffusers.py:583-586``);
    this follows the public diffusers ``convert_open_clip_checkpoint``
    convention: ``resblocks.N`` -> ``encoder.layers.N`` with the fused
    ``attn.in_proj`` split into thirds (q/k/v are stacked row-wise, NOT
    per-head interleaved), and — when all 24 ViT-H resblocks are present —
    the last resblock dropped, since SD2 conditions on the penultimate layer
    ("layer: penultimate" in the LDM yaml) and the diffusers text encoder is
    shipped as the equivalent 23-layer model.
    """
    import re

    n_blocks = 0
    for k in state:
        m = re.match(r"transformer\.resblocks\.(\d+)\.", k)
        if m:
            n_blocks = max(n_blocks, int(m.group(1)) + 1)
    if n_blocks == 0:
        raise ValueError("No transformer.resblocks.* keys: not an OpenCLIP text tower")
    keep = n_blocks - 1 if n_blocks == 24 else n_blocks

    leaf_renames = [
        ("ln_1.", "layer_norm1."),
        ("ln_2.", "layer_norm2."),
        ("mlp.c_fc.", "mlp.fc1."),
        ("mlp.c_proj.", "mlp.fc2."),
        ("attn.out_proj.", "self_attn.out_proj."),
    ]
    out: dict = {}
    consumed = set()
    for k, v in state.items():
        m = re.match(r"transformer\.resblocks\.(\d+)\.(.+)$", k)
        if not m:
            continue
        i, leaf = int(m.group(1)), m.group(2)
        consumed.add(k)
        if i >= keep:
            continue
        pre = f"text_model.encoder.layers.{i}."
        if leaf.startswith("attn.in_proj_"):
            kind = leaf.removeprefix("attn.in_proj_")  # weight | bias
            arr = np.asarray(v)
            d = arr.shape[0] // 3
            for name, part in zip(("q_proj", "k_proj", "v_proj"),
                                  (arr[:d], arr[d:2 * d], arr[2 * d:])):
                out[f"{pre}self_attn.{name}.{kind}"] = part
            continue
        for old, new in leaf_renames:
            if leaf.startswith(old):
                leaf = new + leaf.removeprefix(old)
                break
        out[pre + leaf] = v

    top = {
        "token_embedding.weight": "text_model.embeddings.token_embedding.weight",
        "positional_embedding": "text_model.embeddings.position_embedding.weight",
        "ln_final.weight": "text_model.final_layer_norm.weight",
        "ln_final.bias": "text_model.final_layer_norm.bias",
    }
    for src, dst in top.items():
        if src in state:
            out[dst] = state[src]
            consumed.add(src)
    # text_projection: the SD2 encoder never uses it (drop knowingly), but
    # SDXL's tower 2 projects the pooled EOS state through it. OpenCLIP
    # stores the matrix for x @ proj (d, proj_dim); transformers' Linear
    # weight layout is its transpose.
    if keep_projection and "text_projection" in state:
        out["text_projection.weight"] = np.ascontiguousarray(
            np.asarray(state["text_projection"]).T)
    consumed.update(k for k in ("text_projection", "logit_scale") if k in state)

    leftover = [k for k in state if k not in consumed]
    if leftover:
        raise ValueError(
            f"OpenCLIP conversion left {len(leftover)} unconsumed keys, "
            f"e.g. {leftover[:5]}")
    return out
