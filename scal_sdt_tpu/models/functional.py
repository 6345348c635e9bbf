"""Functional NN primitives over flat parameter dicts.

Design: a model's parameters are a single flat ``{dotted.name: array}`` dict
whose keys are exactly the diffusers/transformers state-dict names and whose
tensors keep the torch layout (Linear ``(out, in)``, Conv ``(out, in, kh, kw)``).
Activations are NHWC. ``dot_general`` / ``conv_general_dilated`` consume the
torch layouts natively — XLA's layout assignment puts the weights in MXU-optimal
form at compile time, so there is no runtime transpose cost, and every
import/export/optim-target/LoRA tool can address parameters by their canonical
names with zero mapping tables.

This replaces the torch ``nn.Module`` graph of the reference
(``/root/reference/modules/model.py``) with jit-friendly pure functions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, jnp.ndarray]

# --- LoRA dropout context ---------------------------------------------------
# loralib applies dropout to the input of the LoRA branch during training
# (/root/reference/modules/lora.py:12-27, lora_dropout arg). Rates are static
# per target path (set once by the Trainer from the optim-target spec); the
# PRNG key rides in the param dict under a reserved name, inserted by the
# train step only — inference/sampling paths never set it, so dropout is
# automatically off there (the analogue of module.eval()).
LORA_DROPOUT_RNG = "__lora_dropout_rng__"
_LORA_DROPOUT_RATES: dict[str, float] = {}


def set_lora_dropout_rates(rates: dict[str, float]) -> None:
    """Replace the static path->rate registry (component-relative paths)."""
    _LORA_DROPOUT_RATES.clear()
    _LORA_DROPOUT_RATES.update({k: float(v) for k, v in rates.items() if v})


def linear(p: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W^T + b with W stored (out, in)."""
    w = p[f"{name}.weight"]
    y = lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    )
    b = p.get(f"{name}.bias")
    if b is not None:
        y = y + b
    y = _lora_delta(p, name, x, y)
    return y


def _lora_delta(p: Params, name: str, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Add the low-rank LoRA update (alpha/r) * x @ A^T @ B^T if present.

    LoRA factors live in the same flat dict as ``{name}.lora_A`` (r, in) and
    ``{name}.lora_B`` (out, r), mirroring the reference's loralib wrapping
    (modules/lora.py:12-27) without module surgery.
    """
    a = p.get(f"{name}.lora_A")
    if a is None:
        return y
    rate = _LORA_DROPOUT_RATES.get(name, 0.0)
    rng = p.get(LORA_DROPOUT_RNG)
    if rate > 0.0 and rng is not None:
        import zlib

        layer_rng = jax.random.fold_in(rng, zlib.crc32(name.encode()))
        keep = jax.random.bernoulli(layer_rng, 1.0 - rate, x.shape)
        x = jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))
    b = p[f"{name}.lora_B"]
    alpha = p.get(f"{name}.lora_alpha")
    rank = a.shape[0]
    scale = (alpha.astype(y.dtype) if alpha is not None else jnp.asarray(1.0, y.dtype)) / rank
    h = lax.dot_general(x, a.astype(x.dtype),
                        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                        preferred_element_type=x.dtype)
    h = lax.dot_general(h, b.astype(x.dtype),
                        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                        preferred_element_type=x.dtype)
    return y + h * scale


def conv2d(p: Params, name: str, x: jnp.ndarray, stride: int = 1, padding: int = 1) -> jnp.ndarray:
    """NHWC convolution with an OIHW kernel (torch layout)."""
    w = p[f"{name}.weight"]
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        preferred_element_type=x.dtype,
    )
    b = p.get(f"{name}.bias")
    if b is not None:
        y = y + b
    if w.shape[2] == 1 and w.shape[3] == 1 and f"{name}.lora_A" in p:
        # 1x1 convs (e.g. Transformer2DModel proj_in/out) admit linear LoRA.
        y = _lora_delta(p, name, x, y)
    return y


def group_norm(p: Params, name: str, x: jnp.ndarray, groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over NHWC; statistics in fp32 for bf16 stability."""
    n, h, w, c = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(n, h, w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    scale = p[f"{name}.weight"].astype(jnp.float32)
    bias = p[f"{name}.bias"].astype(jnp.float32)
    return (xf * scale + bias).astype(orig_dtype)


def layer_norm(p: Params, name: str, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    out = xf * p[f"{name}.weight"].astype(jnp.float32) + p[f"{name}.bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU, matching torch's default."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def sub_params(p: Params, prefix: str) -> Params:
    """View of a flat param dict under `prefix.` with the prefix stripped."""
    cut = len(prefix) + 1
    return {k[cut:]: v for k, v in p.items() if k.startswith(prefix + ".")}


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True, downscale_freq_shift: float = 0.0,
                       max_period: int = 10000, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal timestep features (diffusers get_timestep_embedding semantics)."""
    half = dim // 2
    exponent = -jnp.log(float(max_period)) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)
