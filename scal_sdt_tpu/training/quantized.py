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


# Elements processed per scan chunk. Dequantizing all moments of an 859M-param
# model to fp32 at once needs ~13.6 GB of temporaries (measured: 17.9 GB
# program OOM); chunking through lax.scan bounds the live fp32 working set to
# ~5 chunks (~0.3 GB) while keeping each chunk wide enough to saturate the VPU.
CHUNK = 64 * 1024 * BLOCK  # 16.7M elements


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
        chunk = min(CHUNK, total + ((-total) % BLOCK)) or BLOCK
        padded = total + ((-total) % chunk)
        return entries, total, padded, chunk

    def init(params):
        _, _, padded, _ = _layout(params)
        zeros_q = jnp.zeros((padded,), jnp.int8)
        zeros_s = jnp.zeros((padded // BLOCK,), jnp.float32)
        return ScaleByAdam8bitState(jnp.zeros([], jnp.int32),
                                    zeros_q, zeros_s, zeros_q, zeros_s)

    def update(updates, state, params=None):
        entries, total, padded, chunk = _layout(updates)
        n_chunks = padded // chunk
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        flat_g = jnp.concatenate(
            [updates[k].reshape(-1) for k, _, _ in entries])
        flat_g = jnp.pad(flat_g, (0, padded - total))

        def body(_, xs):
            g, muq, mus, nuq, nus = xs
            gb = g.astype(jnp.float32).reshape(-1, BLOCK)
            mu = _dequantize_blocks(muq, mus)
            nu = _dequantize_blocks(nuq, nus)
            mu = b1 * mu + (1.0 - b1) * gb
            nu = b2 * nu + (1.0 - b2) * jnp.square(gb)
            out = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            muq2, mus2 = _quantize_blocks(mu)
            nuq2, nus2 = _quantize_blocks(nu)
            # emit in the gradient dtype: the stacked fp32 update buffer was
            # the difference between fitting 16 GB and not, and bf16 output
            # error (2^-8 relative) is below the int8 moment error (2^-7)
            return None, (out.reshape(-1).astype(g.dtype), muq2.reshape(-1),
                          mus2, nuq2.reshape(-1), nus2)

        xs = (flat_g.reshape(n_chunks, chunk),
              state.mu_q.reshape(n_chunks, chunk),
              state.mu_s.reshape(n_chunks, chunk // BLOCK),
              state.nu_q.reshape(n_chunks, chunk),
              state.nu_s.reshape(n_chunks, chunk // BLOCK))
        _, (out, mu_q, mu_s, nu_q, nu_s) = jax.lax.scan(body, None, xs)

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
            count, mu_q.reshape(-1), mu_s.reshape(-1),
            nu_q.reshape(-1), nu_s.reshape(-1))

    return optax.GradientTransformation(init, update)
