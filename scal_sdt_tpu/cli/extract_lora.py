"""SVD LoRA extraction (reference: extract_lora.py).

Weight delta between a fine-tuned model and its base, low-rank approximated
per layer-spec target with SVD, exported in AddNet format. Linear and 1x1
Conv targets only (same restriction as the reference, extract_lora.py:138-145).

Factors are scaled by sqrt(rank/alpha) on both sides so AddNet's
``(alpha/rank) * up @ down`` reproduces the delta
(reference extract_lora.py:147-153).
"""

from __future__ import annotations

import logging
from math import sqrt
from pathlib import Path
from typing import Optional

import click
import numpy as np

from ..conf import OPTIM_TARGETS_DIR, load as conf_load, Config
from ..utils.state import DTYPE_MAP, SUPPORTED_FORMATS, save_state_dict
from .ckpt_tool import check_overwrite, load_as_diffusers_state

logger = logging.getLogger("lora-approx")


def lora_approx(delta_w: np.ndarray, rank: int) -> tuple[np.ndarray, np.ndarray]:
    """Rank-r SVD factorization: x @ delta.T ~= x @ down.T @ up.T.

    Returns (down, up) with down = S-weighted right vectors (r, in) and
    up = left vectors (out, r). Runs on the TPU via jnp.linalg.svd when a
    device is available (the reference notes ~15x speedup on accelerator).
    """
    try:
        import jax.numpy as jnp

        u, s, vt = (np.asarray(x) for x in jnp.linalg.svd(delta_w, full_matrices=False))
    except Exception:
        u, s, vt = np.linalg.svd(delta_w, full_matrices=False)
    u = u[:, :rank] * s[:rank][None, :]
    vt = vt[:rank, :]
    return vt, u


def _iter_lora_leaves(nodes, prefix, keys, recurse_conf=None):
    """Yield (path, lora_config) for layer-spec leaves carrying `lora`."""
    from ..conf import merge

    def children(pfx):
        start = pfx + "." if pfx else ""
        seen = {}
        for k in keys:
            if k.startswith(start) and "." in k[len(start):]:
                seen.setdefault(k[len(start):].split(".", 1)[0])
        return list(seen)

    for node in nodes:
        node = node if isinstance(node, Config) else Config(node or {})
        own_rc = node.get("recurse_conf")
        if recurse_conf is None:
            recurse_conf = own_rc
        elif own_rc is not None:
            recurse_conf = merge(recurse_conf, own_rc)
        index = node.get("index")
        targets = node.get("targets")
        selected = children(prefix) if index is None else list(index)
        for path in selected:
            sub = f"{prefix}.{path}" if prefix else path
            if targets is not None:
                yield from _iter_lora_leaves(targets, sub, keys, recurse_conf)
            else:
                conf = node if recurse_conf is None else merge(node, recurse_conf)
                lora = conf.get("lora")
                if lora is not None:
                    yield sub, lora


@click.command()
@click.argument("model", type=click.Path(exists=True, path_type=Path))
@click.argument("base_model", type=click.Path(exists=True, path_type=Path))
@click.argument("output", type=click.Path(path_type=Path))
@click.option("--layer-spec", type=click.Path(exists=True, path_type=Path),
              default=OPTIM_TARGETS_DIR / "lora.yaml",
              help="Layer specification (see configs/optim_targets).")
@click.option("--overwrite", is_flag=True)
@click.option("--dtype", type=click.Choice(list(DTYPE_MAP)), default="fp16")
@click.option("--format", "fmt", type=click.Choice(SUPPORTED_FORMATS), default=None)
@click.option("--ldm-config", type=str, default=None)
def main(model: Path, base_model: Path, output: Path, layer_spec: Path,
         overwrite: bool, dtype: str, fmt: Optional[str], ldm_config: Optional[str]):
    """Extract the (model - base_model) delta as a low-rank LoRA via SVD."""
    check_overwrite(output, overwrite)
    layer_config = conf_load(layer_spec)

    full_unet, full_clip = load_as_diffusers_state(model, ldm_config)
    base_unet, base_clip = load_as_diffusers_state(base_model, ldm_config)
    logger.info("Weights loaded")

    state: dict = {}
    for prefix, full, base, section in [
        ("lora_unet", full_unet, base_unet, layer_config.get("unet")),
        ("lora_te_text_model", full_clip, base_clip, layer_config.get("text_encoder")),
    ]:
        if section is None:
            continue
        keys = list(full.keys())
        # the reference names TE modules relative to encoder.layers...; our
        # clip keys start with text_model. — strip for naming, keep for lookup
        for path, lora_conf in _iter_lora_leaves(section.targets, "", keys):
            w_key = f"{path}.weight"
            if w_key not in full:
                raise KeyError(f"No weight at layer-spec target {path}")
            w_full = np.asarray(full[w_key], np.float32)
            w_base = np.asarray(base[w_key], np.float32)
            if w_full.ndim == 4:
                if w_full.shape[2:] != (1, 1):
                    raise ValueError(f"{path}: only Linear / 1x1 Conv support LoRA")
                w_full, w_base = w_full[..., 0, 0], w_base[..., 0, 0]
            rank = int(lora_conf.get("rank", 4))
            alpha = lora_conf.get("alpha", 1)
            down, up = lora_approx(w_full - w_base, rank)
            scale = sqrt(rank / float(alpha))
            name_path = path
            if prefix == "lora_te_text_model":
                name_path = path.removeprefix("text_model.")
            name = "_".join([prefix] + name_path.split("."))
            state[f"{name}.lora_down.weight"] = (down * scale).astype(DTYPE_MAP[dtype])
            state[f"{name}.lora_up.weight"] = (up * scale).astype(DTYPE_MAP[dtype])
            state[f"{name}.alpha"] = np.asarray(int(alpha), np.int32)

    save_state_dict(state, output, fmt)
    logger.info(f"Wrote {len(state)} tensors to {output}")


if __name__ == "__main__":
    logging.basicConfig(level="INFO")
    main()
