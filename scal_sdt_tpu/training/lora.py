"""LoRA factor parameters for flat param dicts.

Replaces the reference's loralib module wrapping
(``/root/reference/modules/lora.py:12-27``): instead of swapping Linear/Conv2d
modules, low-rank factors are injected as extra keys in the same flat param
dict — ``{path}.lora_A`` (r, in), ``{path}.lora_B`` (out, r) and an int32
``{path}.lora_alpha`` — and the forward adds ``(alpha/r) * x @ A^T @ B^T``
(see ``models/functional._lora_delta``). Checkpoint key names therefore match
the reference's loralib state-dict exactly, which keeps the kohya/AddNet
export (``ckpt_tool.py lora``) format-identical.

Supported targets are Linear and 1x1 Conv weights (the reference asserts the
same; the shipped specs only target attention/ff linears and the 1x1
proj_in/proj_out convs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.functional import Params
from .optim_targets import LoRASpec


def lora_factor_shapes(base_params: Params, lora_specs: dict[str, LoRASpec]) -> dict[str, tuple[int, ...]]:
    shapes = {}
    for path, spec in lora_specs.items():
        w = base_params[f"{path}.weight"]
        if w.ndim == 2:
            out_f, in_f = w.shape
        elif w.ndim == 4 and w.shape[2] == 1 and w.shape[3] == 1:
            out_f, in_f = w.shape[0], w.shape[1]
        else:
            raise ValueError(f"LoRA target {path} must be Linear or 1x1 Conv, got shape {w.shape}")
        shapes[f"{path}.lora_A"] = (spec.rank, in_f)
        shapes[f"{path}.lora_B"] = (out_f, spec.rank)
    return shapes


def init_lora_params(rng: jax.Array, base_params: Params,
                     lora_specs: dict[str, LoRASpec], dtype=jnp.float32) -> Params:
    """A ~ Kaiming-ish normal, B = 0 so the initial LoRA delta is identity."""
    out: Params = {}
    shapes = lora_factor_shapes(base_params, lora_specs)
    paths = sorted(lora_specs)
    keys = jax.random.split(rng, max(len(paths), 1))
    for key, path in zip(keys, paths):
        spec = lora_specs[path]
        a_shape = shapes[f"{path}.lora_A"]
        out[f"{path}.lora_A"] = jax.random.normal(key, a_shape, dtype) * (1.0 / np.sqrt(a_shape[1]))
        out[f"{path}.lora_B"] = jnp.zeros(shapes[f"{path}.lora_B"], dtype)
        out[f"{path}.lora_alpha"] = jnp.asarray(int(spec.alpha), jnp.int32)
    return out


def merge_lora_into_base(base_params: Params, prefix_filter: str = "") -> Params:
    """Fold LoRA factors into the base weights: W' = W + (alpha/r) B @ A.

    Used for sampling/export paths that want plain weights.
    """
    out = dict(base_params)
    for k in list(base_params):
        if not k.endswith(".lora_A"):
            continue
        path = k[: -len(".lora_A")]
        if prefix_filter and not path.startswith(prefix_filter):
            continue
        a = np.asarray(base_params[k], np.float32)
        b = np.asarray(base_params[f"{path}.lora_B"], np.float32)
        alpha = float(np.asarray(base_params.get(f"{path}.lora_alpha", a.shape[0])))
        w = np.asarray(base_params[f"{path}.weight"])
        delta = (alpha / a.shape[0]) * (b @ a)
        if w.ndim == 4:
            delta = delta[:, :, None, None]
        out[f"{path}.weight"] = (w.astype(np.float32) + delta).astype(w.dtype)
        for suffix in (".lora_A", ".lora_B", ".lora_alpha"):
            out.pop(path + suffix, None)
    return out
