"""Fused multi-head attention for UNet/CLIP/VAE blocks.

The TPU-native stand-in for the reference's xformers memory-efficient
attention (``/root/reference/modules/model.py:187-188``). Two code paths:

* ``_attention_xla``: straight jnp einsum chain — XLA already fuses the
  softmax into the matmuls well for the short sequences in CLIP (77) and
  low-res UNet levels; also the CPU-test fallback.
* ``_attention_pallas``: a flash-attention Pallas kernel used on TPU for the
  long self-attention sequences of the high-res UNet levels (up to 4096+
  tokens at 512px, more under aspect-ratio buckets), where materialising the
  (L, L) score matrix would burn HBM bandwidth.

Dispatch is automatic by platform/shape; set ``FORCE_XLA = True`` to disable
the kernel globally (config key ``xformers: false``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Toggled by config `xformers: false`.
FORCE_XLA = False

# Pallas kernel pays off once Lq is long enough that the score matrix
# dominates; below this XLA's fusion wins on compile simplicity.
# (env knob for on-chip tuning sweeps)
import os

_PALLAS_MIN_Q_LEN = int(os.environ.get("SSDT_PALLAS_MIN_Q", 1024))


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, c = x.shape
    return x.reshape(b, l, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                   mask: jnp.ndarray | None = None) -> jnp.ndarray:
    # q,k,v: (B, H, L, D)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "causal"))
def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         num_heads: int, scale: float | None = None,
                         causal: bool = False) -> jnp.ndarray:
    """q: (B, Lq, C); k, v: (B, Lk, C). Returns (B, Lq, C)."""
    head_dim = q.shape[-1] // num_heads
    if scale is None:
        scale = float(head_dim) ** -0.5

    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    out = _attention_core(qh, kh, vh, scale, causal)
    return _merge_heads(out).astype(q.dtype)


def _attention_core(qh: jnp.ndarray, kh: jnp.ndarray, vh: jnp.ndarray,
                    scale: float, causal: bool) -> jnp.ndarray:
    """(B, H, L, D) attention with automatic kernel dispatch."""
    mask = None
    if causal:
        lq, lk = qh.shape[2], kh.shape[2]
        mask = jnp.where(
            np.tril(np.ones((lq, lk), dtype=bool)), 0.0, -jnp.inf
        ).astype(jnp.float32)[None, None]

    use_pallas = (
        not FORCE_XLA
        and not causal
        and qh.shape[2] >= _PALLAS_MIN_Q_LEN
        and kh.shape[2] >= _PALLAS_MIN_Q_LEN   # short-KV cross-attn: XLA wins
        # VAE mid-block attention is single-head with D=512: splash blocks
        # sized for UNet head dims (40-160) exceed the 16 MB scoped-VMEM
        # budget (measured: 22 MB at block 1024). All trained components
        # have D <= 160; the frozen VAE forward is fine as one XLA fusion.
        and qh.shape[3] <= 256
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from .splash import pick_block, splash_attention, splash_attention_padded

        # 1024 measured best at SD1.5 shapes on v5e (512: +16 ms/step,
        # 256: catastrophic, 2048: fails to fit). See PERF_NOTES.md.
        # SSDT_FLASH_BLOCK is honoured as a legacy alias of SSDT_SPLASH_BLOCK.
        pref = int(os.environ.get("SSDT_SPLASH_BLOCK",
                                  os.environ.get("SSDT_FLASH_BLOCK", 1024)))
        bq = pick_block(qh.shape[2], int(os.environ.get("SSDT_SPLASH_BQ", pref)))
        bk = pick_block(kh.shape[2], int(os.environ.get("SSDT_SPLASH_BKV", pref)))
        if bq is not None and bk is not None and min(bq, bk) >= 256:
            # Backward blocks tune independently of the forward pair (the
            # dq/dkv kernels have different arithmetic intensity). Round-3
            # sweep on v5e (lab/micro_splash_sweep.py, PERF_NOTES.md):
            # isolated-kernel sweeps said block_q_dq=512 wins at L=1024,
            # but IN-STEP it regresses the full bench 4.12 -> 3.84 steps/s
            # (measured twice) — micro wins at the sub-ms level do not
            # transfer when the kernel runs inside the big program. The fwd
            # pair stays the default for all four bwd blocks; env knobs
            # remain for sweeps.
            def _bwd(name: str, default: int, length: int) -> int | None:
                return pick_block(length, int(os.environ.get(name, default)))

            bwd = (_bwd("SSDT_SPLASH_BQ_DKV", bq, qh.shape[2]),
                   _bwd("SSDT_SPLASH_BKV_DKV", bk, kh.shape[2]),
                   _bwd("SSDT_SPLASH_BQ_DQ", bq, qh.shape[2]),
                   _bwd("SSDT_SPLASH_BKV_DQ", bk, kh.shape[2]))
            if any(b is None for b in bwd):
                bwd = (bq, bk, bq, bk)
            return splash_attention(qh, kh, vh, scale, bq, bk, tuple(bwd))
        # ARB bucket lengths are multiples of 64, not always of a usable
        # block — pad to the block grid with masked keys rather than fall
        # back to O(L^2)-memory XLA attention (which OOMs at batch 8).
        return splash_attention_padded(qh, kh, vh, scale, 512)
    return _attention_xla(qh, kh, vh, scale, mask)
