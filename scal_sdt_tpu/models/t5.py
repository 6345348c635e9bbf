"""T5 encoder stack as pure JAX functions over a flat param dict.

The second member of the reference's experimental CLIP+T5 ensemble
(``/root/reference/modules/text_encoders.py:137-147``, which wraps
``transformers.T5EncoderModel``). Parameter keys are exactly the
transformers state-dict names so weights load with zero mapping tables
(same convention as ``models/clip.py``).

Numerics match transformers' T5: RMS layer norm in fp32 (eps 1e-6),
UNSCALED attention logits (T5 absorbs 1/sqrt(d) into init), a shared
relative-position bias owned by block 0, and relu or gated-gelu(new) FF.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .functional import Params

T5_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    feed_forward_proj: str = "relu"  # 'relu' | 'gated-gelu'

    @property
    def gated(self) -> bool:
        return self.feed_forward_proj.startswith("gated")

    @classmethod
    def flan_t5_large(cls) -> "T5Config":
        return cls(d_model=1024, d_kv=64, d_ff=2816, num_layers=24,
                   num_heads=16, feed_forward_proj="gated-gelu")

    @classmethod
    def tiny(cls) -> "T5Config":
        return cls(vocab_size=256, d_model=32, d_kv=8, d_ff=64,
                   num_layers=2, num_heads=4)

    @classmethod
    def from_json(cls, d: dict) -> "T5Config":
        return cls(
            vocab_size=d.get("vocab_size", 32128),
            d_model=d.get("d_model", 512),
            d_kv=d.get("d_kv", 64),
            d_ff=d.get("d_ff", 2048),
            num_layers=d.get("num_layers", 6),
            num_heads=d.get("num_heads", 8),
            relative_attention_num_buckets=d.get("relative_attention_num_buckets", 32),
            relative_attention_max_distance=d.get("relative_attention_max_distance", 128),
            feed_forward_proj=d.get("feed_forward_proj", "relu"),
        )


def _rms_norm(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + T5_EPS)
    return (p[f"{name}.weight"].astype(jnp.float32) * xf).astype(x.dtype)


def _proj(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    w = p[f"{name}.weight"]
    return jax.lax.dot_general(
        x, w.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype)


def _relative_position_bucket(relative_position: jnp.ndarray, num_buckets: int,
                              max_distance: int) -> jnp.ndarray:
    """Bidirectional bucket ids (transformers T5Attention._relative_position_bucket)."""
    num_buckets //= 2
    buckets = jnp.where(relative_position > 0, num_buckets, 0)
    rel = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_if_large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rel_if_large = jnp.minimum(rel_if_large, num_buckets - 1)
    return buckets + jnp.where(is_small, rel, rel_if_large)


def _position_bias(p: Params, seq_len: int, config: T5Config, dtype) -> jnp.ndarray:
    """(1, H, L, L) shared relative-position bias from block 0's table."""
    pos = jnp.arange(seq_len)
    relative = pos[None, :] - pos[:, None]  # memory - query
    buckets = _relative_position_bucket(
        relative, config.relative_attention_num_buckets,
        config.relative_attention_max_distance)
    table = p["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
    bias = table[buckets]                       # (L, L, H)
    return bias.transpose(2, 0, 1)[None].astype(dtype)


def _self_attention(p: Params, pre: str, x: jnp.ndarray, bias: jnp.ndarray,
                    config: T5Config) -> jnp.ndarray:
    b, l, _ = x.shape
    h, dk = config.num_heads, config.d_kv

    def heads(t):
        return t.reshape(b, l, h, dk).transpose(0, 2, 1, 3)

    q = heads(_proj(p, f"{pre}.q", x))
    k = heads(_proj(p, f"{pre}.k", x))
    v = heads(_proj(p, f"{pre}.v", x))
    # T5 quirk: NO 1/sqrt(d_kv) scaling (absorbed into initialization)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, h * dk)
    return _proj(p, f"{pre}.o", out)


def _gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """transformers NewGELUActivation (tanh approximation)."""
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


def _feed_forward(p: Params, pre: str, x: jnp.ndarray, config: T5Config) -> jnp.ndarray:
    if config.gated:
        h = _gelu_new(_proj(p, f"{pre}.wi_0", x)) * _proj(p, f"{pre}.wi_1", x)
    else:
        h = jax.nn.relu(_proj(p, f"{pre}.wi", x))
    return _proj(p, f"{pre}.wo", h)


def t5_encoder_apply(params: Params, input_ids: jnp.ndarray,
                     config: T5Config, dtype=jnp.float32) -> jnp.ndarray:
    """input_ids (B, L) int32 -> last hidden state (B, L, d_model)."""
    emb_key = "shared.weight" if "shared.weight" in params else "encoder.embed_tokens.weight"
    x = params[emb_key].astype(dtype)[input_ids]
    bias = _position_bias(params, input_ids.shape[1], config, dtype)
    for i in range(config.num_layers):
        blk = f"encoder.block.{i}"
        n = _rms_norm(params, f"{blk}.layer.0.layer_norm", x)
        x = x + _self_attention(params, f"{blk}.layer.0.SelfAttention", n, bias, config)
        n = _rms_norm(params, f"{blk}.layer.1.layer_norm", x)
        x = x + _feed_forward(params, f"{blk}.layer.1.DenseReluDense", n, config)
    return _rms_norm(params, "encoder.final_layer_norm", x)


def t5_param_shapes(config: T5Config) -> dict[str, tuple[int, ...]]:
    d, inner = config.d_model, config.num_heads * config.d_kv
    s: dict[str, tuple[int, ...]] = {"shared.weight": (config.vocab_size, d)}
    for i in range(config.num_layers):
        blk = f"encoder.block.{i}"
        att = f"{blk}.layer.0.SelfAttention"
        s[f"{att}.q.weight"] = (inner, d)
        s[f"{att}.k.weight"] = (inner, d)
        s[f"{att}.v.weight"] = (inner, d)
        s[f"{att}.o.weight"] = (d, inner)
        s[f"{blk}.layer.0.layer_norm.weight"] = (d,)
        ff = f"{blk}.layer.1.DenseReluDense"
        if config.gated:
            s[f"{ff}.wi_0.weight"] = (config.d_ff, d)
            s[f"{ff}.wi_1.weight"] = (config.d_ff, d)
        else:
            s[f"{ff}.wi.weight"] = (config.d_ff, d)
        s[f"{ff}.wo.weight"] = (d, config.d_ff)
        s[f"{blk}.layer.1.layer_norm.weight"] = (d,)
    s["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = (
        config.relative_attention_num_buckets, config.num_heads)
    s["encoder.final_layer_norm.weight"] = (d,)
    return s


def init_t5_params(rng: jax.Array, config: T5Config, dtype=jnp.float32) -> Params:
    shapes = t5_param_shapes(config)

    @jax.jit
    def init(key):
        params: Params = {}
        keys = jax.random.split(key, len(shapes))
        for k, (name, shape) in zip(keys, sorted(shapes.items())):
            if name.endswith("layer_norm.weight"):
                params[name] = jnp.ones(shape, dtype)
            else:
                fan_in = shape[-1] if len(shape) > 1 else shape[0]
                params[name] = jax.random.normal(k, shape, dtype) / math.sqrt(max(fan_in, 1))
        return params

    return init(rng)


def load_t5_encoder(path) -> tuple[Params, T5Config]:
    """Load a transformers-layout T5 encoder dir (config.json + weights)."""
    import json
    from pathlib import Path

    from ..utils.state import load_state_dict

    path = Path(path)
    config = T5Config.from_json(json.loads((path / "config.json").read_text()))
    weights = None
    for name in ("model.safetensors", "pytorch_model.bin", "model.bin"):
        if (path / name).exists():
            weights = path / name
            break
    if weights is None:
        raise FileNotFoundError(f"No weights file in {path}")
    state = load_state_dict(weights)
    # decoder weights may be present in a full T5 checkpoint; keep encoder side
    state = {k: np.asarray(v) for k, v in state.items()
             if k.startswith(("shared.", "encoder."))}
    return state, config
