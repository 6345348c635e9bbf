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


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         num_heads: int, scale: float | None = None,
                         causal: bool = False) -> jnp.ndarray:
    """q: (B, Lq, C); k, v: (B, Lk, C). Returns (B, Lq, C).

    Deliberately NOT @jax.jit: the sharded dispatch bakes the active mesh
    into the trace (shard_map carries its mesh), and jit's trace cache keys
    on shapes only — a cached trace from one mesh would silently be reused
    under another. Every production caller is already inside a jitted
    program, so the decorator bought nothing.
    """
    head_dim = q.shape[-1] // num_heads
    if scale is None:
        scale = float(head_dim) ** -0.5

    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    out = _attention_core(qh, kh, vh, scale, causal)
    return _merge_heads(out).astype(q.dtype)


def _attention_core(qh: jnp.ndarray, kh: jnp.ndarray, vh: jnp.ndarray,
                    scale: float, causal: bool) -> jnp.ndarray:
    """(B, H, L, D) attention with automatic kernel dispatch.

    On a multi-device mesh the chosen core runs under ``shard_map`` with
    batch on the ``data`` axis and heads on the ``tensor`` axis (attention
    is independent per (batch, head), so no collectives are needed): this
    is what makes the Pallas kernel — a custom call GSPMD cannot partition —
    correct on multi-chip meshes, and what shards heads under tensor
    parallelism. The same wrapper is applied to the XLA core so the
    virtual-CPU-mesh tests execute the exact sharding structure the TPU
    pod path uses.
    """
    return _dispatch_sharded(qh, kh, vh, scale, causal)


def _attention_sharding(qh: jnp.ndarray):
    """(mesh, PartitionSpec) for (B, H, L, D) attention, or (None, None)."""
    from ..parallel.mesh import DATA_AXIS, TENSOR_AXIS, active_mesh
    from jax.sharding import PartitionSpec as P

    mesh = active_mesh()
    if mesh is None or mesh.devices.size <= 1:
        return None, None
    b, h = qh.shape[0], qh.shape[1]
    d_size = mesh.shape.get(DATA_AXIS, 1)
    t_size = mesh.shape.get(TENSOR_AXIS, 1)
    d_axis = DATA_AXIS if d_size > 1 and b % d_size == 0 else None
    t_axis = TENSOR_AXIS if t_size > 1 and h % t_size == 0 else None
    if d_axis is None and t_axis is None:
        return None, None
    return mesh, P(d_axis, t_axis)


def _dispatch_sharded(qh, kh, vh, scale: float, causal: bool) -> jnp.ndarray:
    mesh, spec = _attention_sharding(qh)
    if mesh is None:
        return _dispatch(qh, kh, vh, scale, causal)
    fn = jax.shard_map(
        functools.partial(_dispatch, scale=scale, causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(qh, kh, vh)


def _dispatch(qh: jnp.ndarray, kh: jnp.ndarray, vh: jnp.ndarray,
              scale: float, causal: bool) -> jnp.ndarray:
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
            # compute sub-tiling: the inner loop runs smaller tiles than
            # the DMA block. r5 in-step sweep at SD1.5 shapes (batch 8):
            # 256/256 -> 4.044 steps/s vs 4.019 at full-block compute
            # (512: 4.018, 128: 3.89 — too fine). Must divide the
            # respective kv block; env knobs override for sweeps.
            c_fwd = int(os.environ.get("SSDT_SPLASH_BKV_COMPUTE", 256))
            c_dkv = int(os.environ.get("SSDT_SPLASH_BKV_DKV_COMPUTE", 256))
            cf = c_fwd if c_fwd and bk % c_fwd == 0 else bk
            cd = c_dkv if c_dkv and bwd[1] % c_dkv == 0 else bwd[1]
            kvc = (cf, cd)
            return splash_attention(qh, kh, vh, scale, bq, bk, tuple(bwd),
                                    kv_compute=kvc)
        # ARB bucket lengths are multiples of 64, not always of a usable
        # block — pad to the block grid with masked keys rather than fall
        # back to O(L^2)-memory XLA attention (which OOMs at batch 8).
        return splash_attention_padded(qh, kh, vh, scale, 512)
    return _attention_xla(qh, kh, vh, scale, mask)
