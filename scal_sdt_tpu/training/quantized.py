"""Int8 block-quantized Adam moments — the TPU stand-in for bitsandbytes'
AdamW8bit (the reference's recommended optimizer, configs/README.md:59,
configs/native.yaml:69).

Both Adam moments are stored as int8 payloads with one fp32 scale per
block of 256 values (dynamic blockwise quantization, same idea as
bitsandbytes), cutting optimizer HBM from 8 bytes/param to ~2.03.

Layout: per-leaf ``(lead, n_blocks, 256)`` int8 views, where ``lead`` is the
leaf's leading dim and the remaining dims are flattened (+right-padded) into
256-wide blocks. This is the third design; the first two failed on real
hardware:

* per-leaf 1-D quantize chains (round 1): ~700 tiny XLA subgraphs,
  scheduled at 4.5 s/step;
* ONE flat 1-D buffer over all leaves (round 2 drafts, incl. a fused Pallas
  dequant/Adam/requant kernel): the kernel itself is fast, but
  leaf-shape <-> flat-1D relayouts around it cost ~13 ms per 29M-element
  conv weight EACH WAY (XLA linearizes (O,I,3,3) tilings element-wise) —
  0.7-1.3 s/step total.

The (lead, -1, 256) reshape keeps the leading dim, which the TPU layout
engine handles at copy speed (measured: free, vs 33 ms for the same tensor
through 1-D), so the whole update stays elementwise + a lane-local
max-reduce per block — the same op structure as the bf16-moment fast path.

For SD1.5 full fine-tune this saves ~5.1 GB of HBM vs fp32 moments.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

BLOCK = 256


def _leaf_view(shape) -> tuple[int, int, int]:
    """(lead, minor, n_blocks) for a leaf shape."""
    if len(shape) <= 1:
        lead, minor = 1, int(np.prod(shape)) if shape else 1
    else:
        lead, minor = int(shape[0]), int(np.prod(shape[1:]))
    if minor < BLOCK:
        # a short minor would pad every row to one full block (up to
        # BLOCK/minor x state ballooning) — flatten the whole leaf instead;
        # such leaves are small, so the full linearization stays cheap
        lead, minor = 1, lead * minor
    n_blocks = -(-minor // BLOCK)
    return lead, minor, n_blocks


def _to_blocks(x: jnp.ndarray) -> jnp.ndarray:
    """leaf -> (lead, n_blocks, BLOCK), right-padding the flattened minor."""
    lead, minor, nb = _leaf_view(x.shape)
    v = x.reshape(lead, minor)
    pad = nb * BLOCK - minor
    if pad:
        v = jnp.pad(v, ((0, 0), (0, pad)))
    return v.reshape(lead, nb, BLOCK)


def _from_blocks(v: jnp.ndarray, shape) -> jnp.ndarray:
    lead, minor, nb = _leaf_view(shape)
    return v.reshape(lead, nb * BLOCK)[:, :minor].reshape(shape)


def _quantize_leaf(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(lead, nb, BLOCK) fp32 -> int8 payload + fp32 absmax scale per block."""
    scale = jnp.max(jnp.abs(x), axis=2, keepdims=True) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _dequantize_leaf(payload: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return payload.astype(jnp.float32) * scale


# array-level helpers kept for tools/tests that quantize arbitrary tensors
def _quantize(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    q, s = _quantize_leaf(_to_blocks(x.astype(jnp.float32)))
    return q, s


def _dequantize(payload: jnp.ndarray, scale: jnp.ndarray, shape) -> jnp.ndarray:
    return _from_blocks(_dequantize_leaf(payload, scale), shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    mu_q: Any   # {key: (lead, nb, BLOCK) int8}
    mu_s: Any   # {key: (lead, nb, 1) fp32}
    nu_q: Any
    nu_s: Any


def _is_array(x) -> bool:
    # optax.multi_transform masks other groups' leaves with MaskedNode
    return hasattr(x, "shape")


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8) -> optax.GradientTransformation:
    """Drop-in for optax.scale_by_adam with int8 blockwise moment storage."""

    def init(params):
        mu_q, mu_s = {}, {}
        for k, v in params.items():
            if not _is_array(v):
                continue
            lead, _, nb = _leaf_view(v.shape)
            mu_q[k] = jnp.zeros((lead, nb, BLOCK), jnp.int8)
            mu_s[k] = jnp.zeros((lead, nb, 1), jnp.float32)
        nu_q = {k: v for k, v in mu_q.items()}
        nu_s = {k: v for k, v in mu_s.items()}
        return ScaleByAdam8bitState(jnp.zeros([], jnp.int32),
                                    mu_q, mu_s, nu_q, nu_s)

    def update(updates, state, params=None):
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        new_updates, mu_q, mu_s, nu_q, nu_s = {}, {}, {}, {}, {}
        for k, g in updates.items():
            if not _is_array(g):
                new_updates[k] = g
                continue
            g3 = _to_blocks(g).astype(jnp.float32)
            mu = _dequantize_leaf(state.mu_q[k], state.mu_s[k])
            nu = _dequantize_leaf(state.nu_q[k], state.nu_s[k])
            mu = b1 * mu + (1.0 - b1) * g3
            nu = b2 * nu + (1.0 - b2) * jnp.square(g3)
            out = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            # emit in the gradient dtype: bf16 output error (2^-8 relative)
            # is below the int8 moment error (2^-7), and the fp32 update
            # tree would add 3.4 GB peak on the 859M-param bench
            new_updates[k] = _from_blocks(out, g.shape).astype(g.dtype)
            mu_q[k], mu_s[k] = _quantize_leaf(mu)
            nu_q[k], nu_s[k] = _quantize_leaf(nu)

        return new_updates, ScaleByAdam8bitState(count, mu_q, mu_s, nu_q, nu_s)

    return optax.GradientTransformation(init, update)
