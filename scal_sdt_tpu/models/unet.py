"""SD1.x conditional UNet as pure JAX functions over a flat param dict.

Re-implements the behaviour of diffusers' ``UNet2DConditionModel`` (the
network the reference trains in ``/root/reference/modules/model.py:304``)
TPU-first: NHWC activations, bf16-friendly norms, fused attention via
``ops.attention`` (Pallas flash path for long sequences), and optional
``jax.checkpoint`` rematerialisation per block standing in for torch
gradient checkpointing (reference ``modules/model.py:183-185``).

Parameter keys are exactly the diffusers state-dict names (torch layouts),
so weight import/export, optim-target matching, and LoRA injection all
address parameters canonically. See ``models/functional.py``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_attention
from .functional import (
    Params,
    conv2d,
    group_norm,
    layer_norm,
    linear,
    silu,
    gelu,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # int (SD1.x: 8 everywhere) or per-level tuple (SD2.x: (5, 10, 20, 20),
    # i.e. head_dim 64). Mirrors diffusers' attention_head_dim quirk, which
    # despite its name holds the HEAD COUNT.
    num_attention_heads: int | tuple[int, ...] = 8
    # SD2.x Transformer2D uses nn.Linear proj_in/out instead of 1x1 convs.
    use_linear_projection: bool = False
    cross_attention_dim: int = 768
    # SDXL: BasicTransformerBlocks per attention layer, int or per-level
    # tuple ((1, 2, 10) for SDXL-base; the mid block uses the last level's).
    transformer_layers_per_block: int | tuple[int, ...] = 1
    # SDXL micro-conditioning ('text_time'): pooled text embed + fourier
    # size/crop ids -> MLP -> added to the time embedding.
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    # width of the concatenated [text_embeds, time_ids_embeds] vector
    # (2816 = 1280 pooled + 6*256 fourier for SDXL-base)
    projection_class_embeddings_input_dim: Optional[int] = None
    down_block_types: tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D",
    )
    up_block_types: tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    )
    norm_num_groups: int = 32
    sample_size: int = 64
    flip_sin_to_cos: bool = True
    freq_shift: int = 0

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @classmethod
    def sd15(cls) -> "UNetConfig":
        return cls()

    @classmethod
    def sd21(cls) -> "UNetConfig":
        """SD 2.x: head_dim 64 (per-level head counts), linear projections,
        OpenCLIP-H context width."""
        return cls(num_attention_heads=(5, 10, 20, 20),
                   use_linear_projection=True,
                   cross_attention_dim=1024)

    def heads_at(self, level: int) -> int:
        h = self.num_attention_heads
        return h[level] if isinstance(h, (tuple, list)) else int(h)

    def tf_depth_at(self, level: int) -> int:
        d = self.transformer_layers_per_block
        return d[level] if isinstance(d, (tuple, list)) else int(d)

    @classmethod
    def sdxl(cls) -> "UNetConfig":
        """SDXL-base UNet (diffusers stabilityai/stable-diffusion-xl-base-1.0
        unet/config.json): 3 levels, transformer depths (1, 2, 10), dual-
        text-encoder context width 2048, text_time micro-conditioning."""
        return cls(
            block_out_channels=(320, 640, 1280),
            num_attention_heads=(5, 10, 20),
            use_linear_projection=True,
            cross_attention_dim=2048,
            transformer_layers_per_block=(1, 2, 10),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D",
                              "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                            "UpBlock2D"),
            addition_embed_type="text_time",
            addition_time_embed_dim=256,
            projection_class_embeddings_input_dim=2816,
            sample_size=128,
        )

    @classmethod
    def tiny_sdxl(cls) -> "UNetConfig":
        """Miniature SDXL-shaped variant (text_time conditioning, per-level
        transformer depth) for CPU tests."""
        return cls(
            block_out_channels=(32, 64),
            layers_per_block=1,
            num_attention_heads=(2, 4),
            use_linear_projection=True,
            cross_attention_dim=64,
            transformer_layers_per_block=(1, 2),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            addition_embed_type="text_time",
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=32 + 6 * 8,  # pooled 32 + ids
            norm_num_groups=8,
            sample_size=8,
        )

    @classmethod
    def tiny(cls) -> "UNetConfig":
        """Miniature variant for CPU tests / multi-chip dry runs."""
        return cls(
            block_out_channels=(32, 64),
            layers_per_block=1,
            num_attention_heads=2,
            cross_attention_dim=32,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            norm_num_groups=8,
            sample_size=8,
        )

    @classmethod
    def from_sgm_config(cls, ldm_config) -> "UNetConfig":
        """SDXL sgm-namespace architecture yaml (``network_config`` instead
        of ``unet_config``; per-level ``transformer_depth``; text_time
        micro-conditioning via ``adm_in_channels`` + sequential classes)."""
        u = ldm_config.model.params.network_config.params
        ch = int(u.model_channels)
        mult = list(u.channel_mult)
        block_out = tuple(ch * m for m in mult)
        attn_ds = {int(a) for a in u.attention_resolutions}
        has_attn = [2 ** i in attn_ds for i in range(len(mult))]
        down = tuple("CrossAttnDownBlock2D" if a else "DownBlock2D"
                     for a in has_attn)
        up = tuple("CrossAttnUpBlock2D" if a else "UpBlock2D"
                   for a in reversed(has_attn))
        depth = u.get("transformer_depth", 1)
        depth = tuple(int(d) for d in depth) if isinstance(depth, (list, tuple)) \
            else int(depth)
        heads = tuple(c // int(u.num_head_channels) for c in block_out) \
            if "num_head_channels" in u else int(u.get("num_heads", 8))
        text_time = (str(u.get("num_classes", "")) == "sequential"
                     and u.get("adm_in_channels"))
        return cls(
            in_channels=int(u.in_channels),
            out_channels=int(u.out_channels),
            block_out_channels=block_out,
            layers_per_block=int(u.num_res_blocks),
            num_attention_heads=heads,
            use_linear_projection=bool(u.get("use_linear_in_transformer", False)),
            cross_attention_dim=int(u.context_dim),
            transformer_layers_per_block=depth,
            down_block_types=down,
            up_block_types=up,
            addition_embed_type="text_time" if text_time else None,
            projection_class_embeddings_input_dim=(
                int(u.adm_in_channels) if text_time else None),
            # fixed values in real SD UNets; our extensions for tiny fixtures
            addition_time_embed_dim=int(u.get("addition_time_embed_dim", 256)),
            norm_num_groups=int(u.get("num_groups", 32)),
        )

    @classmethod
    def from_ldm_config(cls, ldm_config) -> "UNetConfig":
        """Derive shapes from a CompVis LDM architecture YAML
        (reference: modules/convert/sd_to_diffusers.py:175-209)."""
        u = ldm_config.model.params.unet_config.params
        ch = int(u.model_channels)
        mult = list(u.channel_mult)
        block_out = tuple(ch * m for m in mult)
        attn_res = set(u.attention_resolutions)
        # LDM counts resolution downscale factors: attention present where
        # the downscale factor is in attention_resolutions.
        down_types = []
        res = 1
        for i in range(len(mult)):
            down_types.append("CrossAttnDownBlock2D" if res in attn_res else "DownBlock2D")
            if i != len(mult) - 1:
                res *= 2
        up_types = []
        for i in range(len(mult)):
            # reversed order
            f = res
            up_types.append("CrossAttnUpBlock2D" if f in attn_res else "UpBlock2D")
            if i != len(mult) - 1:
                res //= 2
        # SD1.x LDM yaml sets num_heads; SD2.x sets num_head_channels (64),
        # giving per-level head counts (reference sd_to_diffusers.py:198-206)
        if "num_head_channels" in u:
            heads = tuple(c // int(u.num_head_channels) for c in block_out)
        else:
            heads = int(u.get("num_heads", 8))
        return cls(
            in_channels=int(u.in_channels),
            out_channels=int(u.out_channels),
            block_out_channels=block_out,
            layers_per_block=int(u.num_res_blocks),
            num_attention_heads=heads,
            use_linear_projection=bool(u.get("use_linear_in_transformer", False)),
            cross_attention_dim=int(u.context_dim),
            down_block_types=tuple(down_types),
            up_block_types=tuple(up_types),
        )


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _resnet(p: Params, pre: str, x: jnp.ndarray, temb: jnp.ndarray, groups: int) -> jnp.ndarray:
    h = group_norm(p, f"{pre}.norm1", x, groups)
    h = silu(h)
    h = conv2d(p, f"{pre}.conv1", h)
    if f"{pre}.time_emb_proj.weight" in p:
        t = linear(p, f"{pre}.time_emb_proj", silu(temb))
        h = h + t[:, None, None, :]
    h = group_norm(p, f"{pre}.norm2", h, groups)
    h = silu(h)
    h = conv2d(p, f"{pre}.conv2", h)
    if f"{pre}.conv_shortcut.weight" in p:
        x = conv2d(p, f"{pre}.conv_shortcut", x, padding=0)
    return x + h


def _cross_attn(p: Params, pre: str, x: jnp.ndarray, context: jnp.ndarray,
                num_heads: int) -> jnp.ndarray:
    # Dense (C->C) projections + head split/merge transposes. Folding the
    # head split into the projections (einsum 'blc,hdc->bhld') was measured
    # 11 ms/step SLOWER: per-head matmuls with head_dim 40 minor are
    # MXU-charged at ceil(40/128) lanes per head — a 3.2x penalty that
    # dwarfs the relayout copies it saves. See PERF_NOTES.md.
    q = linear(p, f"{pre}.to_q", x)
    k = linear(p, f"{pre}.to_k", context)
    v = linear(p, f"{pre}.to_v", context)
    head_dim = q.shape[-1] // num_heads
    out = multi_head_attention(q, k, v, num_heads, float(head_dim) ** -0.5)
    return linear(p, f"{pre}.to_out.0", out)


def _transformer_block(p: Params, pre: str, x: jnp.ndarray, context: jnp.ndarray,
                       num_heads: int) -> jnp.ndarray:
    # Self-attention
    n1 = layer_norm(p, f"{pre}.norm1", x)
    x = x + _cross_attn(p, f"{pre}.attn1", n1, n1, num_heads)
    # Cross-attention
    x = x + _cross_attn(p, f"{pre}.attn2", layer_norm(p, f"{pre}.norm2", x), context, num_heads)
    # GEGLU feed-forward
    h = layer_norm(p, f"{pre}.norm3", x)
    h = linear(p, f"{pre}.ff.net.0.proj", h)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * gelu(gate)
    x = x + linear(p, f"{pre}.ff.net.2", h)
    return x


def _spatial_transformer(p: Params, pre: str, x: jnp.ndarray, context: jnp.ndarray,
                         num_heads: int, groups: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    residual = x
    x = group_norm(p, f"{pre}.norm", x, groups, eps=1e-6)
    # SD1.x: 1x1 conv projections (OIHW, ndim 4); SD2.x: nn.Linear (ndim 2).
    # diffusers also swaps the reshape/projection order between the two.
    proj_linear = p[f"{pre}.proj_in.weight"].ndim == 2
    if proj_linear:
        x = x.reshape(b, h * w, c)
        x = linear(p, f"{pre}.proj_in", x)
    else:
        x = conv2d(p, f"{pre}.proj_in", x, padding=0)
        x = x.reshape(b, h * w, c)
    i = 0
    while f"{pre}.transformer_blocks.{i}.norm1.weight" in p:
        x = _transformer_block(p, f"{pre}.transformer_blocks.{i}", x, context, num_heads)
        i += 1
    if proj_linear:
        x = linear(p, f"{pre}.proj_out", x)
        x = x.reshape(b, h, w, c)
    else:
        x = x.reshape(b, h, w, c)
        x = conv2d(p, f"{pre}.proj_out", x, padding=0)
    return x + residual


def _upsample_nearest(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def unet_apply(params: Params, sample: jnp.ndarray, timesteps: jnp.ndarray,
               context: jnp.ndarray, config: UNetConfig,
               remat: bool | str = False,
               added_cond: Optional[dict] = None) -> jnp.ndarray:
    """Denoising forward pass.

    sample: (B, H, W, C_in) NHWC latents; timesteps: (B,) int32;
    context: (B, L, cross_attention_dim). Returns (B, H, W, C_out).

    added_cond (SDXL 'text_time' micro-conditioning, diffusers
    added_cond_kwargs): {'text_embeds': (B, pooled_dim) pooled projected
    embedding of text encoder 2, 'time_ids': (B, 6) float
    [orig_h, orig_w, crop_top, crop_left, target_h, target_w]}.

    remat: False | True | 'high' | 'top'. 'high' rematerialises only the
    highest-resolution blocks (first down / last two up) — they hold most of
    the activation memory but a minority of the FLOPs, so this recovers most
    of full remat's memory saving at a fraction of the recompute cost.
    'top' is the minimal selective policy: ONLY the single highest-res up
    level (plus the first down level) — the smallest recompute that frees
    the top-resolution activations, sized for "almost fits" cases like the
    +1.7 GB EMA shadow at batch 8 (VERDICT r3 item 1).
    """
    g = config.norm_num_groups
    n_down = len(config.down_block_types)
    n_up = len(config.up_block_types)

    def maybe_ckpt(fn, high_res: bool = False, top_res: bool = False):
        if (remat is True or (remat == "high" and high_res)
                or (remat == "top" and top_res)):
            return jax.checkpoint(fn)
        return fn

    # Time embedding
    t_feat = timestep_embedding(
        timesteps, config.block_out_channels[0],
        flip_sin_to_cos=config.flip_sin_to_cos,
        downscale_freq_shift=float(config.freq_shift),
        dtype=sample.dtype,
    )
    temb = linear(params, "time_embedding.linear_1", t_feat)
    temb = silu(temb)
    temb = linear(params, "time_embedding.linear_2", temb)

    if config.addition_embed_type == "text_time":
        if added_cond is None:
            raise ValueError(
                "this UNet uses text_time conditioning: pass "
                "added_cond={'text_embeds': (B, D), 'time_ids': (B, 6)}")
        text_embeds = added_cond["text_embeds"].astype(sample.dtype)
        time_ids = added_cond["time_ids"]
        b = time_ids.shape[0]
        # fourier-embed each of the 6 ids at addition_time_embed_dim, flatten
        ids_emb = timestep_embedding(
            time_ids.reshape(-1), config.addition_time_embed_dim,
            flip_sin_to_cos=config.flip_sin_to_cos,
            downscale_freq_shift=float(config.freq_shift),
            dtype=sample.dtype,
        ).reshape(b, -1)
        add = jnp.concatenate([text_embeds, ids_emb], axis=-1)
        aug = linear(params, "add_embedding.linear_1", add)
        aug = silu(aug)
        aug = linear(params, "add_embedding.linear_2", aug)
        temb = temb + aug

    h = conv2d(params, "conv_in", sample)
    skips = [h]

    # Down path
    for i, block_type in enumerate(config.down_block_types):
        has_attn = block_type == "CrossAttnDownBlock2D"
        for j in range(config.layers_per_block):
            def down_unit(h_, temb_, context_, i=i, j=j, has_attn=has_attn):
                h_ = _resnet(params, f"down_blocks.{i}.resnets.{j}", h_, temb_, g)
                if has_attn:
                    h_ = _spatial_transformer(
                        params, f"down_blocks.{i}.attentions.{j}", h_, context_,
                        config.heads_at(i), g)
                return h_

            h = maybe_ckpt(down_unit, high_res=(i == 0),
                           top_res=(i == 0))(h, temb, context)
            skips.append(h)
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in params:
            h = conv2d(params, f"down_blocks.{i}.downsamplers.0.conv", h, stride=2)
            skips.append(h)

    # Mid
    def mid_unit(h_, temb_, context_):
        h_ = _resnet(params, "mid_block.resnets.0", h_, temb_, g)
        h_ = _spatial_transformer(params, "mid_block.attentions.0", h_, context_,
                                  config.heads_at(n_down - 1), g)
        h_ = _resnet(params, "mid_block.resnets.1", h_, temb_, g)
        return h_

    h = maybe_ckpt(mid_unit)(h, temb, context)

    # Up path
    for i, block_type in enumerate(config.up_block_types):
        has_attn = block_type == "CrossAttnUpBlock2D"
        for j in range(config.layers_per_block + 1):
            skip = skips.pop()

            def up_unit(h_, skip_, temb_, context_, i=i, j=j, has_attn=has_attn):
                h_ = jnp.concatenate([h_, skip_], axis=-1)
                h_ = _resnet(params, f"up_blocks.{i}.resnets.{j}", h_, temb_, g)
                if has_attn:
                    h_ = _spatial_transformer(
                        params, f"up_blocks.{i}.attentions.{j}", h_, context_,
                        config.heads_at(n_up - 1 - i), g)
                return h_

            h = maybe_ckpt(up_unit, high_res=(i >= n_up - 2),
                           top_res=(i == n_up - 1))(h, skip, temb, context)
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in params:
            h = _upsample_nearest(h)
            h = conv2d(params, f"up_blocks.{i}.upsamplers.0.conv", h)

    h = group_norm(params, "conv_norm_out", h, g)
    h = silu(h)
    return conv2d(params, "conv_out", h)


# ---------------------------------------------------------------------------
# Parameter shape template + init
# ---------------------------------------------------------------------------

def _norm_shapes(pre: str, c: int) -> dict[str, tuple[int, ...]]:
    return {f"{pre}.weight": (c,), f"{pre}.bias": (c,)}


def _linear_shapes(pre: str, cin: int, cout: int, bias: bool = True) -> dict[str, tuple[int, ...]]:
    s = {f"{pre}.weight": (cout, cin)}
    if bias:
        s[f"{pre}.bias"] = (cout,)
    return s


def _conv_shapes(pre: str, cin: int, cout: int, k: int = 3) -> dict[str, tuple[int, ...]]:
    return {f"{pre}.weight": (cout, cin, k, k), f"{pre}.bias": (cout,)}


def _resnet_shapes(pre: str, cin: int, cout: int, temb: Optional[int]) -> dict[str, tuple[int, ...]]:
    s = {}
    s.update(_norm_shapes(f"{pre}.norm1", cin))
    s.update(_conv_shapes(f"{pre}.conv1", cin, cout))
    if temb is not None:
        s.update(_linear_shapes(f"{pre}.time_emb_proj", temb, cout))
    s.update(_norm_shapes(f"{pre}.norm2", cout))
    s.update(_conv_shapes(f"{pre}.conv2", cout, cout))
    if cin != cout:
        s.update(_conv_shapes(f"{pre}.conv_shortcut", cin, cout, k=1))
    return s


def _attn_shapes(pre: str, dim: int, context_dim: int) -> dict[str, tuple[int, ...]]:
    s = {}
    s.update(_linear_shapes(f"{pre}.to_q", dim, dim, bias=False))
    s.update(_linear_shapes(f"{pre}.to_k", context_dim, dim, bias=False))
    s.update(_linear_shapes(f"{pre}.to_v", context_dim, dim, bias=False))
    s.update(_linear_shapes(f"{pre}.to_out.0", dim, dim))
    return s


def _transformer_shapes(pre: str, dim: int, context_dim: int,
                        linear_proj: bool = False,
                        depth: int = 1) -> dict[str, tuple[int, ...]]:
    s = {}
    s.update(_norm_shapes(f"{pre}.norm", dim))
    proj = _linear_shapes if linear_proj else (lambda p, a, b: _conv_shapes(p, a, b, k=1))
    s.update(proj(f"{pre}.proj_in", dim, dim))
    for b in range(depth):
        tb = f"{pre}.transformer_blocks.{b}"
        s.update(_norm_shapes(f"{tb}.norm1", dim))
        s.update(_attn_shapes(f"{tb}.attn1", dim, dim))
        s.update(_norm_shapes(f"{tb}.norm2", dim))
        s.update(_attn_shapes(f"{tb}.attn2", dim, context_dim))
        s.update(_norm_shapes(f"{tb}.norm3", dim))
        s.update(_linear_shapes(f"{tb}.ff.net.0.proj", dim, dim * 8))
        s.update(_linear_shapes(f"{tb}.ff.net.2", dim * 4, dim))
    s.update(proj(f"{pre}.proj_out", dim, dim))
    return s


def unet_param_shapes(config: UNetConfig) -> dict[str, tuple[int, ...]]:
    s: dict[str, tuple[int, ...]] = {}
    ch = config.block_out_channels
    temb_dim = config.time_embed_dim
    ctx = config.cross_attention_dim

    s.update(_linear_shapes("time_embedding.linear_1", ch[0], temb_dim))
    s.update(_linear_shapes("time_embedding.linear_2", temb_dim, temb_dim))
    if config.addition_embed_type == "text_time":
        add_in = config.projection_class_embeddings_input_dim
        if add_in is None:
            raise ValueError("text_time conditioning requires "
                             "projection_class_embeddings_input_dim")
        s.update(_linear_shapes("add_embedding.linear_1", add_in, temb_dim))
        s.update(_linear_shapes("add_embedding.linear_2", temb_dim, temb_dim))
    s.update(_conv_shapes("conv_in", config.in_channels, ch[0]))

    out_c = ch[0]
    down_out_channels = [ch[0]]  # skip channels, mirrors the forward's skip list
    for i, block_type in enumerate(config.down_block_types):
        in_c, out_c = out_c, ch[i]
        has_attn = block_type == "CrossAttnDownBlock2D"
        for j in range(config.layers_per_block):
            s.update(_resnet_shapes(f"down_blocks.{i}.resnets.{j}", in_c if j == 0 else out_c, out_c, temb_dim))
            if has_attn:
                s.update(_transformer_shapes(f"down_blocks.{i}.attentions.{j}", out_c, ctx,
                                             config.use_linear_projection,
                                             depth=config.tf_depth_at(i)))
            down_out_channels.append(out_c)
        if i != len(config.down_block_types) - 1:
            s.update(_conv_shapes(f"down_blocks.{i}.downsamplers.0.conv", out_c, out_c))
            down_out_channels.append(out_c)

    mid_c = ch[-1]
    s.update(_resnet_shapes("mid_block.resnets.0", mid_c, mid_c, temb_dim))
    s.update(_transformer_shapes("mid_block.attentions.0", mid_c, ctx,
                                 config.use_linear_projection,
                                 depth=config.tf_depth_at(len(ch) - 1)))
    s.update(_resnet_shapes("mid_block.resnets.1", mid_c, mid_c, temb_dim))

    rev = list(reversed(ch))
    prev_out = mid_c
    for i, block_type in enumerate(config.up_block_types):
        out_ci = rev[i]
        has_attn = block_type == "CrossAttnUpBlock2D"
        for j in range(config.layers_per_block + 1):
            skip_c = down_out_channels.pop()
            in_c = (prev_out if j == 0 else out_ci) + skip_c
            s.update(_resnet_shapes(f"up_blocks.{i}.resnets.{j}", in_c, out_ci, temb_dim))
            if has_attn:
                s.update(_transformer_shapes(f"up_blocks.{i}.attentions.{j}", out_ci, ctx,
                                             config.use_linear_projection,
                                             depth=config.tf_depth_at(
                                                 len(ch) - 1 - i)))
        if i != len(config.up_block_types) - 1:
            s.update(_conv_shapes(f"up_blocks.{i}.upsamplers.0.conv", out_ci, out_ci))
        prev_out = out_ci

    s.update(_norm_shapes("conv_norm_out", ch[0]))
    s.update(_conv_shapes("conv_out", ch[0], config.out_channels))
    return s


def init_unet_params(rng: jax.Array, config: UNetConfig, dtype=jnp.float32) -> Params:
    """Random init (fan-in scaled); real runs import pretrained weights.

    Runs as ONE jitted program: per-tensor dispatch is prohibitively slow on
    remote-attached TPUs (hundreds of ops x tunnel round-trip).
    """
    shapes = unet_param_shapes(config)

    @jax.jit
    def init(key):
        params: Params = {}
        keys = jax.random.split(key, len(shapes))
        for k, (name, shape) in zip(keys, sorted(shapes.items())):
            if name.endswith(".bias") or (len(shape) == 1 and name.endswith(".weight")):
                params[name] = (jnp.zeros if name.endswith(".bias") else jnp.ones)(shape, dtype)
            else:
                fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
                params[name] = jax.random.normal(k, shape, dtype) * (1.0 / math.sqrt(max(fan_in, 1)))
        return params

    return init(rng)
