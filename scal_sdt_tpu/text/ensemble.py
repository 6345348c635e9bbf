"""Ensemble text encoding (reference: EnsembleTextEncoder + clip_t5_encoder,
/root/reference/modules/text_encoders.py:126-147 — experimental there too).

Concatenates the sequence outputs of several encoders along the token axis,
optionally projecting each to a common width first. Functional: an encoder is
(params, apply_fn, tokenizer); the ensemble tokenizes per encoder and concats
hidden states. The reference's CLIP+T5 combo maps onto two entries; any
encoder with the same (B, L_i, D) output contract works.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from ..models.functional import Params, linear, layer_norm


@dataclasses.dataclass
class EncoderEntry:
    params: Params
    apply_fn: Callable[[Params, jnp.ndarray], jnp.ndarray]  # (params, ids) -> (B, L, D)
    tokenizer: Callable
    # optional projection to the common dim: names '<prefix>.weight' etc in params
    projection_prefix: Optional[str] = None


def encode_ensemble(entries: Sequence[EncoderEntry], prompts: list[str]) -> jnp.ndarray:
    """-> (B, sum L_i, D) conditioning."""
    outs = []
    for e in entries:
        ids = jnp.asarray(e.tokenizer(prompts))
        z = e.apply_fn(e.params, ids)
        if e.projection_prefix is not None:
            z = linear(e.params, f"{e.projection_prefix}.0", z)
            z = layer_norm(e.params, f"{e.projection_prefix}.1", z)
        outs.append(z)
    dims = {int(z.shape[-1]) for z in outs}
    assert len(dims) == 1, f"ensemble members disagree on width: {dims}"
    return jnp.concatenate(outs, axis=1)
