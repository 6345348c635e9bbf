"""CLIP text encoder (ViT-L/14 text tower) as pure JAX functions.

TPU-native equivalent of ``transformers.CLIPTextModel`` as used by the
reference's ``CLIPTextEncoder`` (``/root/reference/modules/text_encoders.py:74-123``).

CLIP-skip semantics: the reference removes the last ``stop_at_layer - 1``
transformer layers at construction time and still applies the final layer
norm (text_encoders.py:80-82). Here the same effect is a call-time
``stop_at_layer`` argument — the penultimate-layer hidden state is what SD1.x
fine-tunes commonly condition on (``clip_stop_at_layer: 2``).

Parameter keys match the transformers state-dict names under ``text_model.``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_attention
from .functional import Params, gelu, layer_norm, linear, quick_gelu


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"   # SD2.x's OpenCLIP-derived encoder: "gelu"
    # CLIPTextModelWithProjection (SDXL text encoder 2): pooled EOS state
    # projected to this width; None = no projection head.
    projection_dim: Optional[int] = None
    eos_token_id: int = 49407

    @classmethod
    def vit_l(cls) -> "CLIPTextConfig":
        return cls()

    @classmethod
    def sdxl_g(cls) -> "CLIPTextConfig":
        """SDXL text encoder 2 (OpenCLIP ViT-bigG in transformers layout,
        CLIPTextModelWithProjection)."""
        return cls(hidden_size=1280, intermediate_size=5120,
                   num_hidden_layers=32, num_attention_heads=20,
                   hidden_act="gelu", projection_dim=1280)

    @classmethod
    def sd21(cls) -> "CLIPTextConfig":
        """SD 2.x text encoder (OpenCLIP ViT-H in transformers CLIP layout)."""
        return cls(hidden_size=1024, intermediate_size=4096,
                   num_hidden_layers=23, num_attention_heads=16,
                   hidden_act="gelu")

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(vocab_size=1000, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=77)


def clip_text_apply(params: Params, input_ids: jnp.ndarray, config: CLIPTextConfig,
                    stop_at_layer: int = 1) -> jnp.ndarray:
    """input_ids: (B, L) int32 -> last hidden state (B, L, hidden).

    ``stop_at_layer=k`` drops the last ``k - 1`` transformer layers before the
    final layer norm (CLIP-skip).
    """
    x = _embed(params, input_ids)
    num_layers = config.num_hidden_layers - (stop_at_layer - 1)
    for i in range(num_layers):
        x = _encoder_layer(params, i, x, config)
    return layer_norm(params, "text_model.final_layer_norm", x)


def _embed(p: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    tok = p["text_model.embeddings.token_embedding.weight"]
    # Textual-inversion TRAINING (text/ti.py, beyond reference parity):
    # trained placeholder vectors live in a separate trainable leaf appended
    # below the frozen table, so only they receive gradients.
    extra = p.get("text_model.embeddings.token_embedding.trained_extra")
    if extra is not None:
        tok = jnp.concatenate([tok, extra.astype(tok.dtype)], axis=0)
    pos = p["text_model.embeddings.position_embedding.weight"]
    return tok[input_ids] + pos[:input_ids.shape[1]]


def _encoder_layer(p: Params, i: int, x: jnp.ndarray,
                   config: CLIPTextConfig) -> jnp.ndarray:
    heads = config.num_attention_heads
    head_dim = config.hidden_size // heads
    pre = f"text_model.encoder.layers.{i}"
    n = layer_norm(p, f"{pre}.layer_norm1", x)
    q = linear(p, f"{pre}.self_attn.q_proj", n)
    k = linear(p, f"{pre}.self_attn.k_proj", n)
    v = linear(p, f"{pre}.self_attn.v_proj", n)
    attn = multi_head_attention(q, k, v, heads, float(head_dim) ** -0.5, causal=True)
    x = x + linear(p, f"{pre}.self_attn.out_proj", attn)
    n = layer_norm(p, f"{pre}.layer_norm2", x)
    h = linear(p, f"{pre}.mlp.fc1", n)
    h = quick_gelu(h) if config.hidden_act == "quick_gelu" else gelu(h)
    return x + linear(p, f"{pre}.mlp.fc2", h)


def clip_text_encode_sdxl(params: Params, input_ids: jnp.ndarray,
                          config: CLIPTextConfig
                          ) -> tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """SDXL-style encode: (penultimate hidden state WITHOUT final layer norm,
    pooled projected embedding).

    Matches diffusers' StableDiffusionXLPipeline.encode_prompt: the sequence
    conditioning is ``hidden_states[-2]`` (raw, un-normed), while the pooled
    vector comes from the FULL stack -> final_layer_norm -> EOS-position
    gather -> ``text_projection`` (when the config has one, i.e. encoder 2).
    """
    x = _embed(params, input_ids)
    penult = None
    for i in range(config.num_hidden_layers):
        if i == config.num_hidden_layers - 1:
            penult = x
        x = _encoder_layer(params, i, x, config)
    x = layer_norm(params, "text_model.final_layer_norm", x)

    pooled = None
    if config.projection_dim is not None:
        eos = eos_positions(input_ids, config.eos_token_id)
        gathered = x[jnp.arange(x.shape[0]), eos]
        w = params["text_projection.weight"]
        pooled = gathered @ w.astype(gathered.dtype).T
    return penult, pooled


def eos_positions(input_ids: jnp.ndarray, eos_token_id: int) -> jnp.ndarray:
    """Per-row EOS position, (B,) int.

    transformers parity quirk (modeling_clip.py): CLIP configs shipped with
    the legacy ``eos_token_id: 2`` use argmax(input_ids) (the highest token
    id — correct in practice because the real EOS 49407 IS the max id);
    otherwise the first true-EOS occurrence. argmax returns the FIRST
    maximal position, so eos-padded rows resolve to the first EOS either
    way."""
    if eos_token_id == 2:
        return jnp.argmax(input_ids, axis=-1)
    return jnp.argmax((input_ids == eos_token_id).astype(jnp.int32), axis=-1)


def clip_param_shapes(config: CLIPTextConfig) -> dict[str, tuple[int, ...]]:
    d, m = config.hidden_size, config.intermediate_size
    s: dict[str, tuple[int, ...]] = {
        "text_model.embeddings.token_embedding.weight": (config.vocab_size, d),
        "text_model.embeddings.position_embedding.weight": (config.max_position_embeddings, d),
        "text_model.final_layer_norm.weight": (d,),
        "text_model.final_layer_norm.bias": (d,),
    }
    for i in range(config.num_hidden_layers):
        pre = f"text_model.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            s[f"{pre}.{ln}.weight"] = (d,)
            s[f"{pre}.{ln}.bias"] = (d,)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            s[f"{pre}.self_attn.{proj}.weight"] = (d, d)
            s[f"{pre}.self_attn.{proj}.bias"] = (d,)
        s[f"{pre}.mlp.fc1.weight"] = (m, d)
        s[f"{pre}.mlp.fc1.bias"] = (m,)
        s[f"{pre}.mlp.fc2.weight"] = (d, m)
        s[f"{pre}.mlp.fc2.bias"] = (d,)
    if config.projection_dim is not None:
        s["text_projection.weight"] = (config.projection_dim, d)
    return s


def init_clip_params(rng: jax.Array, config: CLIPTextConfig, dtype=jnp.float32) -> Params:
    shapes = clip_param_shapes(config)

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
                fan_in = shape[-1]
                params[name] = jax.random.normal(k, shape, dtype) * (1.0 / math.sqrt(fan_in))
        return params

    return init(rng)
