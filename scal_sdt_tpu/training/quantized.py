"""Int8 block-quantized Adam moments — the TPU stand-in for bitsandbytes'
AdamW8bit (the reference's recommended optimizer, configs/README.md:59,
configs/native.yaml:69).

Both Adam moments are stored as int8 payloads with one fp32 scale per
block of 256 values (dynamic blockwise quantization, same idea as
bitsandbytes), cutting optimizer HBM from 8 bytes/param to ~2.03.

Layout: ONE flat int8 buffer per moment covering every leaf, rather than
per-leaf payloads. Per-leaf quantize chains (round 1) compiled into ~700
independent pad/reshape/reduce subgraphs that XLA scheduled abysmally
(4.5 s/step); the flat layout runs the dequant→Adam→requant math as a single
(M, 256) vectorized chain on the VPU (measured ~36x faster). Leaf order is
the sorted key order, fixed at init.

For SD1.5 full fine-tune (859M params) this saves ~5.1 GB of HBM —
the difference between fitting larger batches on a 16 GB chip or not.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

BLOCK = 256


def _quantize_blocks(blocks: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(M, BLOCK) fp32 -> int8 payload + fp32 absmax scale per block."""
    scale = jnp.max(jnp.abs(blocks), axis=1) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(blocks / safe[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _dequantize_blocks(payload: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return payload.reshape(-1, BLOCK).astype(jnp.float32) * scale[:, None]


def _quantize(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Array-level convenience: flatten, pad to BLOCK, blockwise-quantize."""
    flat = x.reshape(-1)
    pad = (-flat.shape[0]) % BLOCK
    q, s = _quantize_blocks(jnp.pad(flat, (0, pad)).reshape(-1, BLOCK))
    return q.reshape(-1), s


def _dequantize(payload: jnp.ndarray, scale: jnp.ndarray, shape) -> jnp.ndarray:
    n = int(np.prod(shape))
    return _dequantize_blocks(payload, scale).reshape(-1)[:n].reshape(shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    mu_q: jnp.ndarray   # (N_pad,) int8
    mu_s: jnp.ndarray   # (N_pad/BLOCK,) fp32
    nu_q: jnp.ndarray
    nu_s: jnp.ndarray


def _is_array(x) -> bool:
    # optax.multi_transform masks other groups' leaves with MaskedNode
    return hasattr(x, "shape")


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8) -> optax.GradientTransformation:
    """Drop-in for optax.scale_by_adam with int8 blockwise moment storage."""

    def _layout(tree: dict):
        """Deterministic (key, size, shape) layout over array leaves."""
        entries = []
        for k in sorted(tree.keys()):
            v = tree[k]
            if _is_array(v):
                entries.append((k, int(np.prod(v.shape)), v.shape))
        total = sum(n for _, n, _ in entries)
        padded = total + ((-total) % BLOCK)
        return entries, total, padded

    def init(params):
        _, _, padded = _layout(params)
        zeros_q = jnp.zeros((padded,), jnp.int8)
        zeros_s = jnp.zeros((padded // BLOCK,), jnp.float32)
        return ScaleByAdam8bitState(jnp.zeros([], jnp.int32),
                                    zeros_q, zeros_s, zeros_q, zeros_s)

    def update(updates, state, params=None):
        entries, total, padded = _layout(updates)
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        flat_g = jnp.concatenate(
            [updates[k].reshape(-1).astype(jnp.float32) for k, _, _ in entries])
        flat_g = jnp.pad(flat_g, (0, padded - total)).reshape(-1, BLOCK)

        mu = _dequantize_blocks(state.mu_q, state.mu_s)
        nu = _dequantize_blocks(state.nu_q, state.nu_s)
        mu = b1 * mu + (1.0 - b1) * flat_g
        nu = b2 * nu + (1.0 - b2) * jnp.square(flat_g)
        out = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        mu_q, mu_s = _quantize_blocks(mu)
        nu_q, nu_s = _quantize_blocks(nu)

        out_flat = out.reshape(-1)
        new_updates, offset = {}, 0
        for k, n, shape in entries:
            g = updates[k]
            new_updates[k] = jax.lax.dynamic_slice_in_dim(
                out_flat, offset, n).reshape(shape).astype(g.dtype)
            offset += n
        for k, v in updates.items():
            if not _is_array(v):
                new_updates[k] = v

        return new_updates, ScaleByAdam8bitState(
            count, mu_q.reshape(-1), mu_s, nu_q.reshape(-1), nu_s)

    return optax.GradientTransformation(init, update)
