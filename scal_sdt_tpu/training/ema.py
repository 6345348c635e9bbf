"""Exponential moving average of trainable UNet params, on-device.

Reference: ``/root/reference/modules/ema.py`` with the trainer integration at
``modules/model.py:399-412``. The decay warmup is identical:
``decay_t = min(decay, (1 + n) / (10 + n))``. The torch version shuttles the
shadow copy CPU<->GPU around every step to save VRAM; on TPU the shadow lives
in HBM and updates inside the jitted train step — zero host traffic.

Memory: a full-SD1.5 fp32 shadow is 3.4 GB, which does not fit next to a
batch-8 no-remat step on a 16 GB chip (measured OOM). ``ema.dtype: bf16``
halves that using **stochastic rounding**: the EMA delta per step is
``(1-decay)*(p-s)`` ~ 1e-4 relative, far below the bf16 ulp (~4e-3 relative),
so deterministic bf16 truncation would freeze the shadow entirely; rounding
to bf16 with probability proportional to the residual keeps the EMA unbiased
(E[shadow] equals the fp32 EMA — tests/test_ema_and_optim.py).

State is a plain pytree {shadow: Params, num_updates: int32 scalar} so it
shards/donates with the rest of the train state. Checkpoints store it under
``unet_ema.shadow_params.*`` exactly like the reference
(modules/model.py:388-389), so ``ckpt_tool prune --ema`` is format-compatible.
"""

from __future__ import annotations

import zlib
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.functional import Params


class EMAState(NamedTuple):
    shadow: Params
    num_updates: jnp.ndarray  # int32 scalar
    decay: jnp.ndarray        # float32 scalar


def _murmur_mix(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer (full avalanche) over uint32."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def cheap_dither_u32(shape, step: jnp.ndarray, salt: int) -> jnp.ndarray:
    """32 uniform hash bits per element from a counter-based hash of
    (element index, step, salt) — pure VPU compute (~7 fused ops/element,
    no HBM round-trip).

    Replaces the per-step hardware-RNG draws for stochastic rounding: an
    unsafe_rbg draw over the 859M-param set costs ~27 ms/step on the v5e
    (threefry ~40 ms) because RngBitGenerator runs many mixing rounds; a
    murmur3-finalizer counter hash is statistically ample for rounding
    dither (only per-element uniformity and step-to-step decorrelation
    matter — tests/test_cheap_dither.py) at a fraction of the ops, and XLA
    fuses it straight into the consuming update chain. With full avalanche
    the high and low 16-bit halves serve as two independent dither
    streams — SR sites that touch the same tensor in one step (bf16 master
    apply + bf16 EMA shadow) split one hash instead of paying two."""
    import math

    n = math.prod(shape) if shape else 1
    i = jax.lax.iota(jnp.uint32, max(n, 1))
    seed = (jnp.asarray(step).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            ) ^ jnp.uint32(salt & 0xFFFFFFFF)
    return _murmur_mix(i * jnp.uint32(2654435761) + seed).reshape(shape)


def cheap_dither_u16(shape, step: jnp.ndarray, salt: int) -> jnp.ndarray:
    """High 16 bits of :func:`cheap_dither_u32` as uint16.

    (A half-the-hash-cost variant feeding element PAIRS from one u32 was
    tried and reverted: the stack/slice/reshape chain defeats XLA fusion,
    materializing the dither for (O,I,3,3) conv weights at 64x tile
    padding — +6.9 GB and an instant OOM. The fused full-shape hash costs
    ~2-3 ms/step per 859M-element site and zero bytes.)"""
    return (cheap_dither_u32(shape, step, salt) >> 16).astype(jnp.uint16)


def stochastic_round_bf16_bits(x: jnp.ndarray,
                               r16: jnp.ndarray) -> jnp.ndarray:
    """fp32 -> bf16 stochastic rounding with caller-provided dither bits
    (uint values < 2^16). Integer-add-and-truncate: unbiased; exact no-op
    when x is already a bf16 value (low mantissa bits are zero, no carry)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jax.lax.bitcast_convert_type(
        ((bits + r16.astype(jnp.uint32)) >> 16).astype(jnp.uint16),
        jnp.bfloat16)


def stochastic_round_bf16_cheap(x: jnp.ndarray, step: jnp.ndarray,
                                salt: int) -> jnp.ndarray:
    """fp32 -> bf16 stochastic rounding with the counter-hash dither,
    deterministic in (step, salt) — no separate RNG draw."""
    return stochastic_round_bf16_bits(
        x, cheap_dither_u16(x.shape, step, salt))


def hw_dither_key(key: jax.Array) -> jax.Array:
    """Derive a hardware-RNG (unsafe_rbg) key from a threefry key.

    The SR dithers draw 16 random bits per element over the full 859M-param
    set each step; XLA's RngBitGenerator path is ~1.5x cheaper than
    threefry at that scale on the v5e VPU (measured 27 vs 40 ms per draw).
    unsafe_rbg's weaker fold_in/statistical guarantees are irrelevant for
    rounding dither — only per-element uniformity matters."""
    seed = jax.random.bits(key, (), jnp.uint32)
    return jax.random.key(seed, impl="unsafe_rbg")


def stochastic_round_bf16(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """fp32 -> bf16 with stochastic rounding (unbiased: E[out] == x).

    Adds a uniform 16-bit integer to the fp32 bit pattern and truncates the
    low mantissa bits; a carry into the kept bits happens with probability
    equal to the dropped fraction — the standard SR-by-integer-add trick.
    (NaN/inf propagate unchanged: their truncated patterns stay NaN/inf
    except at the very top of the finite range, irrelevant for weights.)
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    r = jax.random.bits(key, x.shape, jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(
        ((bits + r) >> 16).astype(jnp.uint16), jnp.bfloat16)


def ema_init(params: Params, decay: float, dtype=jnp.float32) -> EMAState:
    # copy=True: astype on an already-fp32 array would alias the trainable
    # buffer, and aliased buffers break jit donation (donated twice).
    return EMAState(
        shadow={k: jnp.array(v, dtype, copy=True) for k, v in params.items()},
        num_updates=jnp.asarray(0, jnp.int32),
        decay=jnp.asarray(decay, jnp.float32),
    )


def ema_update(state: EMAState, params: Params,
               rng: Optional[jax.Array] = None,
               step: Optional[jnp.ndarray] = None,
               dither: Optional[dict] = None) -> EMAState:
    """EMA step. bf16 shadows need a dither source for the SR store:
    ``dither`` (per-key precomputed 16-bit streams — the bf16-master step
    shares one hash between its master-SR and this shadow-SR), ``step``
    (counter-hash dither, fused and free), or ``rng`` (hardware-RNG draw,
    the r4 mechanism, kept for tests)."""
    n = state.num_updates + 1
    decay = jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))
    one_minus = 1.0 - decay
    shadow = {}
    for k, s in state.shadow.items():
        new = s.astype(jnp.float32) - one_minus * (
            s.astype(jnp.float32) - params[k].astype(jnp.float32))
        if s.dtype == jnp.bfloat16:
            if dither is not None and k in dither:
                new = stochastic_round_bf16_bits(new, dither[k])
            elif step is not None:
                new = stochastic_round_bf16_cheap(
                    new, step, zlib.crc32(k.encode()) ^ 0xE3A0002)
            elif rng is not None:
                new = stochastic_round_bf16(
                    new, jax.random.fold_in(rng, zlib.crc32(k.encode())))
            else:
                raise ValueError("bf16 EMA shadow requires a dither source "
                                 "(step or rng) for stochastic rounding")
        else:
            new = new.astype(s.dtype)
        shadow[k] = new
    return EMAState(shadow=shadow, num_updates=n, decay=state.decay)


def ema_state_dict(state: EMAState) -> dict:
    """Checkpoint layout matching the reference's EMA state dict
    (modules/ema.py:101-113)."""
    import numpy as np

    return {
        "decay": float(np.asarray(state.decay)),
        "num_updates": int(np.asarray(state.num_updates)),
        "shadow_params": {k: np.asarray(v) for k, v in state.shadow.items()},
    }


def ema_from_state_dict(d: dict) -> EMAState:
    return EMAState(
        shadow={k: jnp.asarray(v) for k, v in d["shadow_params"].items()},
        num_updates=jnp.asarray(int(d.get("num_updates", 0)), jnp.int32),
        decay=jnp.asarray(float(d["decay"]), jnp.float32),
    )
