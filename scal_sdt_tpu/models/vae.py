"""AutoencoderKL (SD1.x VAE) as pure JAX functions over a flat param dict.

TPU-native equivalent of the diffusers ``AutoencoderKL`` the reference uses
for latent encoding (``/root/reference/modules/model.py:257-268``) and the
offline latent cache (``/root/reference/cache.py:33``). NHWC activations;
parameter keys match the diffusers state-dict names.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_attention
from .functional import Params, conv2d, group_norm, linear, silu, sub_params


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    # SD3-family VAEs subtract a latent mean before scaling:
    # z = (z - shift_factor) * scaling_factor (diffusers AutoencoderKL).
    shift_factor: float = 0.0
    # SD3's 16-channel VAE drops the (identity-initialised) 1x1 quant convs
    # entirely (diffusers AutoencoderKL use_quant_conv/use_post_quant_conv).
    use_quant_conv: bool = True
    use_post_quant_conv: bool = True

    @classmethod
    def sd15(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def sd3(cls) -> "VAEConfig":
        # stabilityai/stable-diffusion-3-medium vae/config.json
        return cls(latent_channels=16, scaling_factor=1.5305,
                   shift_factor=0.0609,
                   use_quant_conv=False, use_post_quant_conv=False)

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8)

    @classmethod
    def from_ldm_config(cls, ldm_config) -> "VAEConfig":
        dd = ldm_config.model.params.first_stage_config.params.ddconfig
        ch = int(dd.ch)
        return cls(
            in_channels=int(dd.in_channels),
            out_channels=int(dd.out_ch),
            latent_channels=int(dd.z_channels),
            block_out_channels=tuple(ch * m for m in dd.ch_mult),
            layers_per_block=int(dd.num_res_blocks),
            # LDM VAEs are always GroupNorm(32); num_groups is our extension
            # so miniature test fixtures can round-trip through LDM yamls
            norm_num_groups=int(dd.get("num_groups", 32)),
        )


def _resnet(p: Params, pre: str, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    h = group_norm(p, f"{pre}.norm1", x, groups, eps=1e-6)
    h = silu(h)
    h = conv2d(p, f"{pre}.conv1", h)
    h = group_norm(p, f"{pre}.norm2", h, groups, eps=1e-6)
    h = silu(h)
    h = conv2d(p, f"{pre}.conv2", h)
    if f"{pre}.conv_shortcut.weight" in p:
        x = conv2d(p, f"{pre}.conv_shortcut", x, padding=0)
    return x + h


def _attn(p: Params, pre: str, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    res = x
    y = group_norm(p, f"{pre}.group_norm", x, groups, eps=1e-6)
    y = y.reshape(b, h * w, c)
    q = linear(p, f"{pre}.to_q", y)
    k = linear(p, f"{pre}.to_k", y)
    v = linear(p, f"{pre}.to_v", y)
    out = multi_head_attention(q, k, v, num_heads=1, scale=float(c) ** -0.5)
    out = linear(p, f"{pre}.to_out.0", out)
    return res + out.reshape(b, h, w, c)


def _mid(p: Params, pre: str, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    x = _resnet(p, f"{pre}.resnets.0", x, groups)
    x = _attn(p, f"{pre}.attentions.0", x, groups)
    x = _resnet(p, f"{pre}.resnets.1", x, groups)
    return x


def encoder_apply(params: Params, images: jnp.ndarray, config: VAEConfig) -> jnp.ndarray:
    """images: (B, H, W, 3) in [-1, 1] -> moments (B, H/8, W/8, 2*latent)."""
    p = sub_params(params, "encoder")
    g = config.norm_num_groups
    h = conv2d(p, "conv_in", images)
    for i in range(len(config.block_out_channels)):
        for j in range(config.layers_per_block):
            h = _resnet(p, f"down_blocks.{i}.resnets.{j}", h, g)
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in p:
            # diffusers VAE downsample: asymmetric (0,1) pad + stride-2 valid conv
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(p, f"down_blocks.{i}.downsamplers.0.conv", h, stride=2, padding=0)
    h = _mid(p, "mid_block", h, g)
    h = group_norm(p, "conv_norm_out", h, g, eps=1e-6)
    h = silu(h)
    h = conv2d(p, "conv_out", h)
    if "quant_conv.weight" in params:
        h = conv2d(params, "quant_conv", h, padding=0)
    return h


def sample_latents(moments: jnp.ndarray, rng: jax.Array,
                   scaling_factor: float = 0.18215,
                   shift_factor: float = 0.0) -> jnp.ndarray:
    """Sample from the diagonal Gaussian and apply the SD latent scale
    (the reference's `.latent_dist.sample() * 0.18215`, modules/model.py:263;
    SD3 VAEs additionally subtract shift_factor first)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    noise = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
    return (mean + std * noise - shift_factor) * scaling_factor


def decoder_apply(params: Params, latents: jnp.ndarray, config: VAEConfig) -> jnp.ndarray:
    """latents: (B, h, w, latent) already divided by scaling factor -> images (B, 8h, 8w, 3)."""
    z = (conv2d(params, "post_quant_conv", latents, padding=0)
         if "post_quant_conv.weight" in params else latents)
    p = sub_params(params, "decoder")
    g = config.norm_num_groups
    h = conv2d(p, "conv_in", z)
    h = _mid(p, "mid_block", h, g)
    for i in range(len(config.block_out_channels)):
        for j in range(config.layers_per_block + 1):
            h = _resnet(p, f"up_blocks.{i}.resnets.{j}", h, g)
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in p:
            b, hh, ww, c = h.shape
            h = jnp.broadcast_to(h[:, :, None, :, None, :], (b, hh, 2, ww, 2, c)).reshape(b, hh * 2, ww * 2, c)
            h = conv2d(p, f"up_blocks.{i}.upsamplers.0.conv", h)
    h = group_norm(p, "conv_norm_out", h, g, eps=1e-6)
    h = silu(h)
    return conv2d(p, "conv_out", h)


# ---------------------------------------------------------------------------
# Parameter shape template + init
# ---------------------------------------------------------------------------

def _norm_s(pre, c):
    return {f"{pre}.weight": (c,), f"{pre}.bias": (c,)}


def _conv_s(pre, cin, cout, k=3):
    return {f"{pre}.weight": (cout, cin, k, k), f"{pre}.bias": (cout,)}


def _lin_s(pre, cin, cout):
    return {f"{pre}.weight": (cout, cin), f"{pre}.bias": (cout,)}


def _resnet_s(pre, cin, cout):
    s = {}
    s.update(_norm_s(f"{pre}.norm1", cin))
    s.update(_conv_s(f"{pre}.conv1", cin, cout))
    s.update(_norm_s(f"{pre}.norm2", cout))
    s.update(_conv_s(f"{pre}.conv2", cout, cout))
    if cin != cout:
        s.update(_conv_s(f"{pre}.conv_shortcut", cin, cout, k=1))
    return s


def _mid_s(pre, c):
    s = {}
    s.update(_resnet_s(f"{pre}.resnets.0", c, c))
    s.update(_norm_s(f"{pre}.attentions.0.group_norm", c))
    s.update(_lin_s(f"{pre}.attentions.0.to_q", c, c))
    s.update(_lin_s(f"{pre}.attentions.0.to_k", c, c))
    s.update(_lin_s(f"{pre}.attentions.0.to_v", c, c))
    s.update(_lin_s(f"{pre}.attentions.0.to_out.0", c, c))
    s.update(_resnet_s(f"{pre}.resnets.1", c, c))
    return s


def vae_param_shapes(config: VAEConfig) -> dict[str, tuple[int, ...]]:
    s: dict[str, tuple[int, ...]] = {}
    ch = config.block_out_channels
    z = config.latent_channels

    # Encoder
    s.update(_conv_s("encoder.conv_in", config.in_channels, ch[0]))
    c = ch[0]
    for i in range(len(ch)):
        for j in range(config.layers_per_block):
            s.update(_resnet_s(f"encoder.down_blocks.{i}.resnets.{j}", c if j == 0 else ch[i], ch[i]))
        c = ch[i]
        if i != len(ch) - 1:
            s.update(_conv_s(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c))
    s.update(_mid_s("encoder.mid_block", ch[-1]))
    s.update(_norm_s("encoder.conv_norm_out", ch[-1]))
    s.update(_conv_s("encoder.conv_out", ch[-1], 2 * z))
    if config.use_quant_conv:
        s.update(_conv_s("quant_conv", 2 * z, 2 * z, k=1))

    # Decoder
    if config.use_post_quant_conv:
        s.update(_conv_s("post_quant_conv", z, z, k=1))
    s.update(_conv_s("decoder.conv_in", z, ch[-1]))
    s.update(_mid_s("decoder.mid_block", ch[-1]))
    rev = list(reversed(ch))
    c = rev[0]
    for i in range(len(rev)):
        for j in range(config.layers_per_block + 1):
            s.update(_resnet_s(f"decoder.up_blocks.{i}.resnets.{j}", c if j == 0 else rev[i], rev[i]))
        c = rev[i]
        if i != len(rev) - 1:
            s.update(_conv_s(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c))
    s.update(_norm_s("decoder.conv_norm_out", rev[-1]))
    s.update(_conv_s("decoder.conv_out", rev[-1], config.out_channels))
    return s


def init_vae_params(rng: jax.Array, config: VAEConfig, dtype=jnp.float32) -> Params:
    shapes = vae_param_shapes(config)

    @jax.jit
    def init(key):
        params: Params = {}
        keys = jax.random.split(key, len(shapes))
        for k, (name, shape) in zip(keys, sorted(shapes.items())):
            if name.endswith(".bias"):
                params[name] = jnp.zeros(shape, dtype)
            elif len(shape) == 1:
                params[name] = jnp.ones(shape, dtype)
            else:
                fan_in = int(np.prod(shape[1:]))
                params[name] = jax.random.normal(k, shape, dtype) * (1.0 / math.sqrt(max(fan_in, 1)))
        return params

    return init(rng)
