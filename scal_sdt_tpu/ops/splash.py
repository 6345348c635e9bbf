"""Splash-attention wrapper: the TPU self-attention kernel for UNet shapes.

The TPU self-attention kernel (the reference's xformers role,
``/root/reference/modules/model.py:187-188``); replaced the stock
``pallas.ops.tpu.flash_attention`` wrapper in round 2.
Measured on v5e at SD1.5 shapes (B8 H8 L4096 D40): splash with the UNPADDED
head dim and the non-fused backward is ~8% faster end-to-end than the stock
kernel at D padded to 128, and it avoids the stock wrapper's fp32
``[B,H,L,block]`` logsumexp broadcasts (~6 ms/step) plus the explicit Q/K/V/O
pad-and-slice traffic (head_dim 40/80 stays native; the MXU charges the same
either way, HBM does not).

The kernel object (mask layout + pallas program) is cached per static shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as _sk,
    splash_attention_mask as _sm,
)


@functools.lru_cache(maxsize=32)
def _make_kernel(num_heads: int, q_len: int, kv_len: int, block_q: int,
                 block_kv: int, kv_valid: int = 0,
                 bwd_blocks: tuple[int, int, int, int] | None = None,
                 kv_compute: tuple[int, int] | None = None):
    """kv_valid > 0 marks a right-padded KV: keys >= kv_valid are masked out
    (ARB bucket sequence lengths are multiples of 64, not always of a usable
    block size — padding to the block grid keeps every bucket on the kernel
    path instead of falling back to an O(L^2)-memory XLA attention)."""
    if kv_valid:
        import numpy as np

        m = np.zeros((q_len, kv_len), dtype=bool)
        m[:, :kv_valid] = True
        mask = _sm.MultiHeadMask([_sm.NumpyMask(m) for _ in range(num_heads)])
    else:
        mask = _sm.MultiHeadMask([_sm.FullMask((q_len, kv_len))
                                  for _ in range(num_heads)])
    # Backward blocks are tunable independently of the forward pair — the
    # dq/dkv kernels have different arithmetic intensity than the fwd one
    # (round-3 sweep, PERF_NOTES.md).
    bq_dkv, bkv_dkv, bq_dq, bkv_dq = bwd_blocks or (block_q, block_kv,
                                                    block_q, block_kv)
    # kv_compute: optional (fwd, dkv) compute sub-tiling — the kernel
    # DMAs block_kv at a time but runs the inner loop on smaller tiles,
    # a lever the r3 sweep (which covered only the four block pairs)
    # never probed (VERDICT r4 item 4).
    bkv_c, bkv_dkv_c = kv_compute or (block_kv, bkv_dkv)
    sizes = _sk.BlockSizes(
        block_q=block_q, block_kv=block_kv, block_kv_compute=bkv_c,
        block_q_dkv=bq_dkv, block_kv_dkv=bkv_dkv,
        block_kv_dkv_compute=bkv_dkv_c,
        # separate dq/dkv kernels: the fused backward measured ~25% slower
        # at these shapes (it serialises the dq accumulation)
        block_q_dq=bq_dq, block_kv_dq=bkv_dq,
        use_fused_bwd_kernel=False,
    )
    # The kernel pytree holds concrete mask-info arrays. Build them eagerly
    # even when first invoked under a jit trace (the cache outlives the
    # trace, so captured tracers would leak into later programs).
    with jax.ensure_compile_time_eval():
        return _sk.make_splash_mha(mask, block_sizes=sizes,
                                   head_shards=1, q_seq_shards=1)


def pick_block(length: int, preferred: int = 512) -> int | None:
    """Largest power-of-two block <= preferred that divides `length`."""
    # Env-knob sweeps may pass non-power-of-two preferences (e.g. 768);
    # start from the largest power of two <= preferred so the divisibility
    # walk probes 512/256/128 instead of 768/384/192.
    b = 128
    while b * 2 <= preferred:
        b *= 2
    while b >= 128:
        if length % b == 0:
            return b
        b //= 2
    return None


def splash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: float, block_q: int, block_kv: int,
                     bwd_blocks: tuple[int, int, int, int] | None = None,
                     kv_compute: tuple[int, int] | None = None
                     ) -> jnp.ndarray:
    """q, k, v: (B, H, L, D) bf16/f32 -> (B, H, Lq, D). Non-causal.

    ``bwd_blocks``: optional (block_q_dkv, block_kv_dkv, block_q_dq,
    block_kv_dq) override; defaults to the forward pair.
    ``kv_compute``: optional (block_kv_compute, block_kv_dkv_compute)
    sub-tiling; defaults to the DMA block sizes.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    kernel = _make_kernel(h, lq, lk, block_q, block_kv, bwd_blocks=bwd_blocks,
                          kv_compute=kv_compute)
    qs = q * jnp.asarray(scale, q.dtype)
    return jax.vmap(kernel)(qs, k, v)


def splash_attention_padded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            scale: float, block: int = 512) -> jnp.ndarray:
    """Splash for sequence lengths that no usable block divides.

    Pads Q/K/V up to the block grid; padded KEYS are masked out inside the
    kernel (padded query rows compute garbage that is sliced off — they never
    influence real rows). Zero extra HBM beyond the pad copies.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lqp = -(-lq // block) * block
    lkp = -(-lk // block) * block

    def pad_seq(x, target):
        n = target - x.shape[2]
        if n == 0:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, n), (0, 0)))

    qp, kp, vp = pad_seq(q, lqp), pad_seq(k, lkp), pad_seq(v, lkp)
    kernel = _make_kernel(h, lqp, lkp, block, block,
                          kv_valid=lk if lkp != lk else 0,
                          kv_compute=((256, 256) if block % 256 == 0
                                      else None))
    out = jax.vmap(kernel)(qp * jnp.asarray(scale, q.dtype), kp, vp)
    return out[:, :, :lq]
