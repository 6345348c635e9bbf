"""TPU flash-attention wrapper for UNet head shapes.

SD1.x UNet attention uses 8 heads with head_dim 40/80/160 — not the 128-lane
shape the TPU flash kernel tiles for. We zero-pad head_dim up to a multiple of
128: padding Q/K feature columns with zeros leaves Q·K^T unchanged, and
zero-padded V columns produce zero output columns that are sliced off.
sm_scale is passed explicitly so padding never affects scaling.

The underlying kernel (jax.experimental.pallas.ops.tpu.flash_attention) is an
online-softmax Pallas kernel with a custom VJP (separate dKV/dQ kernels), so
this path is fully trainable.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    flash_attention as _tpu_flash_attention,
)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_last(x: jnp.ndarray, target: int) -> jnp.ndarray:
    pad = target - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """q, k, v: (B, H, L, D) -> (B, H, Lq, D). Non-causal."""
    d = q.shape[-1]
    dp = _round_up(d, 128)
    qp, kp, vp = _pad_last(q, dp), _pad_last(k, dp), _pad_last(v, dp)

    import os

    lq, lk = qp.shape[2], kp.shape[2]
    pref = int(os.environ.get("SSDT_FLASH_BLOCK", 512))
    block_q = min(pref, lq)
    block_k = min(pref, lk)

    # The dKV and dQ kernels have different VMEM working sets than the
    # forward (they hold extra residuals), so their block sizes are tunable
    # independently (default: same as forward).
    def _env(name: str, default: int, limit: int) -> int:
        return min(int(os.environ.get(name, default)), limit)

    bq_dkv = _env("SSDT_FLASH_BLOCK_Q_DKV", pref, lq)
    bk_dkv = _env("SSDT_FLASH_BLOCK_K_DKV", pref, lk)
    bq_dq = _env("SSDT_FLASH_BLOCK_Q_DQ", pref, lq)
    bk_dq = _env("SSDT_FLASH_BLOCK_K_DQ", pref, lk)
    sizes = BlockSizes(
        block_q=block_q, block_k_major=block_k, block_k=block_k, block_b=1,
        block_q_major_dkv=bq_dkv, block_k_major_dkv=bk_dkv,
        block_k_dkv=bk_dkv, block_q_dkv=bq_dkv,
        block_k_major_dq=bk_dq, block_k_dq=bk_dq, block_q_dq=bq_dq,
    )
    out = _tpu_flash_attention(qp, kp, vp, causal=False, sm_scale=scale, block_sizes=sizes)
    return out[..., :d]
