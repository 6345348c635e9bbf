"""kohya/AddNet LoRA file import — the inverse of ckpt_tool's export.

Lets `sample.py --ckpt` (and graft workflows) consume LoRA files from the
wider kohya/WebUI ecosystem, not just our own training checkpoints. The
flattened underscore names (``lora_unet_down_blocks_0_attentions_...``) are
resolved back to dotted module paths by matching against the loaded model's
actual parameter names (inversion by string surgery alone is ambiguous —
path segments themselves contain underscores).
"""

from __future__ import annotations

import logging
from typing import Iterable, Optional

import numpy as np

logger = logging.getLogger("kohya")

_LEAF_MAP = {"lora_down.weight": "lora_A", "lora_up.weight": "lora_B",
             "alpha": "lora_alpha"}


def is_kohya_lora(state: dict) -> bool:
    return any(k.startswith(("lora_unet_", "lora_te_", "lora_te1_",
                             "lora_te2_")) for k in state)


def _module_paths(param_names: Iterable[str]) -> dict[str, str]:
    """flattened underscore name -> dotted module path, for every module
    (= prefix of a '.weight' param) of a component."""
    out = {}
    for n in param_names:
        if n.endswith(".weight"):
            path = n[: -len(".weight")]
            out[path.replace(".", "_")] = path
    return out


def _unet_module_paths(param_names: Iterable[str]) -> dict[str, str]:
    """UNet modules under BOTH naming dialects: diffusers-style flats
    (kohya SD1.x LoRAs — kohya's SD UNet is diffusers') and LDM-style flats
    (kohya SDXL LoRAs — kohya's SDXL UNet is sgm-style, so files carry
    ``lora_unet_input_blocks_4_1_...``). Resolved through the same
    architecture-driven bijection as checkpoint conversion."""
    from .sd_names import _apply_renames, infer_unet_layout, unet_prefix_map

    names = list(param_names)
    out = _module_paths(names)
    layout = infer_unet_layout(names)
    if layout is not None:
        pairs = unet_prefix_map(layout)
        for flat, path in list(out.items()):
            ldm_path = _apply_renames(path + ".", pairs)[:-1]
            out.setdefault(ldm_path.replace(".", "_"), path)
    return out


def from_kohya_format(state: dict, unet_names: Iterable[str],
                      te_names: Iterable[str],
                      te2_names: Optional[Iterable[str]] = None) -> dict:
    """kohya LoRA state -> our prefixed checkpoint tensor dict
    (``unet.{path}.lora_A`` etc.), consumable by the same merge path as
    training checkpoints. Unresolvable modules raise (a silently-skipped
    LoRA is worse than an error)."""
    from ..training.step import TE2_PREFIX, TE_PREFIX, UNET_PREFIX

    maps = {
        "lora_unet": (UNET_PREFIX, _unet_module_paths(unet_names)),
        "lora_te1": (TE_PREFIX, _module_paths(te_names)),
        "lora_te": (TE_PREFIX, _module_paths(te_names)),
    }
    if te2_names is not None:
        maps["lora_te2"] = (TE2_PREFIX, _module_paths(te2_names))

    out: dict = {}
    unresolved = []
    for k, v in state.items():
        matched = False
        for kohya_prefix in sorted(maps, key=len, reverse=True):
            if not k.startswith(kohya_prefix + "_"):
                continue
            matched = True
            ckpt_prefix, paths = maps[kohya_prefix]
            rest = k[len(kohya_prefix) + 1:]
            if "." not in rest:
                unresolved.append(k)
                break
            flat, leaf = rest.split(".", 1)
            if leaf not in _LEAF_MAP:
                unresolved.append(k)
                break
            path = paths.get(flat)
            if path is None:
                unresolved.append(k)
                break
            arr = np.asarray(v)
            if arr.ndim == 4:
                if arr.shape[2:] != (1, 1):
                    raise ValueError(
                        f"{k}: 3x3-conv LoRA is not supported (our LoRA "
                        f"applies to Linear and 1x1-conv modules, like the "
                        f"reference's loralib usage)")
                arr = arr.reshape(arr.shape[0], arr.shape[1])
            if leaf == "alpha":
                arr = np.asarray(int(arr), np.int32)
            out[f"{ckpt_prefix}.{path}.{_LEAF_MAP[leaf]}"] = arr
            break
        if not matched and k.startswith("lora_"):
            unresolved.append(k)
    if unresolved:
        raise ValueError(
            f"kohya LoRA: {len(unresolved)} keys could not be resolved "
            f"against the loaded model, e.g. {sorted(unresolved)[:4]} "
            f"(wrong base model or unsupported module set)")
    logger.info(f"Imported {len(out)} kohya LoRA tensors")
    return out
