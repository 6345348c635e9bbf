"""Declarative optim-target resolution over flat parameter names.

The reference selects trainable submodules by walking the torch module tree
with a recursive ``{index, targets, recurse_conf}`` spec
(``/root/reference/modules/utils/torch/module.py:14-63`` driven by
``modules/model.py:136-164``), mutating ``requires_grad`` and collecting
per-group optimizer overrides, optionally swapping Linear/Conv2d modules for
loralib wrappers.

In a pytree world the same spec resolves purely against parameter *names*:
the flat param dict's dotted keys mirror the module tree, so "submodule" ==
"key prefix". The result is (a) the set of trainable keys, (b) ordered param
groups with optimizer overrides (consumed by ``optax.multi_transform``
labels), and (c) LoRA factor specs for keys to be injected — no module
surgery, no mutation.

Spec YAML files in ``configs/optim_targets/`` use the exact reference schema,
so user specs port unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional

from ..conf import Config, merge


@dataclasses.dataclass(frozen=True)
class LoRASpec:
    rank: int = 4
    alpha: float = 1.0
    dropout: float = 0.0


@dataclasses.dataclass
class ParamGroup:
    """One optimizer group: trainable keys + optimizer kwarg overrides."""
    keys: list[str]
    optimizer: dict


@dataclasses.dataclass
class TargetResolution:
    trainable: list[str]
    groups: list[ParamGroup]
    lora: dict[str, LoRASpec]  # module path -> spec

    @property
    def any_trainable(self) -> bool:
        return bool(self.trainable)


def _children(param_keys: list[str], prefix: str) -> list[str]:
    """Distinct next path segments under `prefix` (module-tree children)."""
    start = prefix + "." if prefix else ""
    seen: dict[str, None] = {}
    for k in param_keys:
        if not k.startswith(start):
            continue
        rest = k[len(start):]
        seg = rest.split(".", 1)[0]
        if "." in rest:  # only keys with deeper structure form child modules
            seen.setdefault(seg)
    return list(seen)


def _join(prefix: str, path: str) -> str:
    return f"{prefix}.{path}" if prefix else path


def _module_param_keys(param_keys: list[str], prefix: str) -> list[str]:
    start = prefix + "." if prefix else ""
    return [k for k in param_keys if k.startswith(start)]


# Fixed buffers that must never become trainable even when a target subtree
# selects them (torch registers these as non-parameter buffers): the MMDiT's
# sincos positional table (diffusers PatchEmbed.pos_embed).
BUFFERS = ("pos_embed.pos_embed",)


def resolve_targets(component_targets: list, param_keys: Iterable[str]) -> TargetResolution:
    """Resolve a `targets:` list for one component (unet / text_encoder)."""
    param_keys = list(param_keys)
    result = TargetResolution(trainable=[], groups=[], lora={})

    def leaf(prefix: str, node_config: Config):
        lora_conf = node_config.get("lora")
        if lora_conf is not None:
            spec = LoRASpec(rank=int(lora_conf.get("rank", 4)),
                            alpha=float(lora_conf.get("alpha", 1)),
                            dropout=float(lora_conf.get("dropout", 0.0)))
            weight_key = f"{prefix}.weight"
            if weight_key not in param_keys:
                raise KeyError(f"LoRA target {prefix} has no weight parameter")
            result.lora[prefix] = spec
            keys = [f"{prefix}.lora_A", f"{prefix}.lora_B"]
        else:
            keys = [k for k in _module_param_keys(param_keys, prefix)
                    if k not in BUFFERS and not k.endswith(
                        tuple("." + b for b in BUFFERS))]
            if not keys:
                raise KeyError(f"Optim target {prefix} matches no parameters")
        result.trainable.extend(keys)
        result.groups.append(ParamGroup(keys=keys, optimizer=dict(node_config.get("optimizer", {}))))

    def walk(prefix: str, nodes: list, recurse_conf: Optional[Config]):
        for node in nodes:
            node = node if isinstance(node, Config) else Config(node or {})
            index = node.get("index")
            targets = node.get("targets")

            # NOTE: recurse_conf deliberately persists across sibling nodes,
            # matching the reference's loop-scoped accumulation
            # (modules/utils/torch/module.py:35-40).
            own_rc = node.get("recurse_conf")
            if recurse_conf is None:
                recurse_conf = own_rc
            elif own_rc is not None:
                recurse_conf = merge(recurse_conf, own_rc)
            rc = recurse_conf

            if index is None:
                selected = _children(param_keys, prefix)
                # In torch, iterating children of a leaf (e.g. Linear) yields
                # nothing; here a prefix with only direct leaves has no children.
                if not selected and targets is None:
                    selected = [None]  # treat the module itself as the leaf
            else:
                selected = list(index)

            # `optional: true` skips indexed paths with no parameters instead
            # of erroring — for architectures where a submodule legitimately
            # exists only on SOME siblings (e.g. the SD3 MMDiT's final
            # pre_only block has no to_add_out/ff_context; lora_sd3.yaml).
            # The default stays strict, matching the reference's torch
            # getattr semantics (modules/utils/torch/module.py:14-63).
            optional = bool(node.get("optional", False))
            for path in selected:
                sub = prefix if path is None else _join(prefix, path)
                if optional and index is not None \
                        and not _module_param_keys(param_keys, sub):
                    continue
                if targets is not None:
                    walk(sub, targets, rc)
                else:
                    leaf(sub, node if rc is None else merge(node, rc))

    walk("", component_targets, None)
    return result


def resolve_optim_target(optim_target: Config,
                         unet_keys: Iterable[str],
                         text_encoder_keys: Iterable[str],
                         text_encoder_2_keys: Optional[Iterable[str]] = None,
                         ) -> dict[str, TargetResolution]:
    """Resolve the full optim-target spec (reference modules/model.py:223-242).

    Returns a dict with 'unet' / 'text_encoder' (and, for SDXL models,
    'text_encoder_2') resolutions; components absent from the spec get an
    empty resolution == permanently frozen.
    """
    components = [("unet", unet_keys), ("text_encoder", text_encoder_keys)]
    if text_encoder_2_keys is not None:
        components.append(("text_encoder_2", text_encoder_2_keys))
    out = {}
    for name, keys in components:
        section = optim_target.get(name)
        if section is None:
            out[name] = TargetResolution(trainable=[], groups=[], lora={})
        else:
            out[name] = resolve_targets(section.targets, keys)
    if text_encoder_2_keys is None and optim_target.get("text_encoder_2"):
        raise ValueError("optim target addresses text_encoder_2 but the "
                         "loaded model has no second text tower (not SDXL)")
    return out


def group_labels(resolutions: dict[str, TargetResolution]) -> dict[str, str]:
    """Map prefixed trainable param key -> group label ('g<N>').

    Keys are prefixed with their component's checkpoint namespace prefix
    ('unet.' / 'condition_model.encoder.'), matching the trainable param
    dict built by the trainer (reference modules/model.py:378-391 stores
    'unet.*' / 'condition_model.*').
    """
    from .step import component_prefix

    labels: dict[str, str] = {}
    g = 0
    for comp, res in resolutions.items():
        prefix = component_prefix(comp)
        for group in res.groups:
            label = f"g{g}"
            for k in group.keys:
                labels[f"{prefix}.{k}"] = label
            g += 1
    return labels
