"""Micro: stochastic-rounding RNG cost in the bf16 EMA update (TPU).

The EMA-on bench regressed 4.11 -> 2.57 steps/s (+152 ms). Suspect: threefry
`jax.random.bits` over the 860M-element shadow. Candidates measured here on
SD1.5-like leaf shapes (total ~860M elements):

  a) fp32 EMA update (no SR)                      -- memory-traffic floor
  b) bf16 SR via jax.random.bits (threefry)       -- current implementation
  c) bf16 SR via lax.rng_bit_generator (TPU hw RNG)

Honest protocol: warmup 2, then time N iters with a host value fetch.
Run: python lab/micro_ema_sr.py   (TPU; serialize vs other TPU work)

RESULT (v5e-1, 2026-08-19, 665M elements, no donation):
    fp32 EMA (no SR)              58.6 ms
    bf16 SR rng_bit_generator     49.8 ms
    bf16 SR threefry (current)    57.0 ms
SR is NOT the regression: threefry SR costs the same as the fp32 update
(RNG hides behind the memory traffic), and the bf16 shadow's halved
traffic shows up as expected (rbg 8.8 ms under fp32). The in-step +146 ms
must come from elsewhere (see PERF_NOTES round-3 EMA entry).
"""

from __future__ import annotations

import time
import zlib

import jax
import jax.numpy as jnp
import numpy as np

# SD1.5 UNet big-leaf profile: a handful of shapes that dominate the 859M
# param count (exact leaf set not needed for an RNG-throughput micro).
SHAPES = (
    [(1280, 1280, 3, 3)] * 24    # 424M
    + [(1280, 5120)] * 12        # 79M
    + [(5120, 1280)] * 12
    + [(1280, 1280)] * 60        # 98M
    + [(640, 640, 3, 3)] * 12    # 44M
    + [(320, 320, 3, 3)] * 12    # 11M
)


def make(dtype):
    return {f"w{i}": jnp.ones(s, dtype) for i, s in enumerate(SHAPES)}


def sr_threefry(x, key):
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    r = jax.random.bits(key, x.shape, jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(
        ((bits + r) >> 16).astype(jnp.uint16), jnp.bfloat16)


def sr_rbg(x, key4):
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    _, r = jax.lax.rng_bit_generator(key4, x.shape, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        ((bits + (r & jnp.uint32(0xFFFF))) >> 16).astype(jnp.uint16),
        jnp.bfloat16)


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    out = fn(*args)  # warmup x2 (layout fixpoint)
    _ = float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:36s} {dt:8.1f} ms")
    return dt


def main():
    n = sum(int(np.prod(s)) for s in SHAPES)
    print(f"total elements: {n/1e6:.0f}M")
    params = make(jnp.float32)
    decay = jnp.float32(0.9999)

    @jax.jit
    def ema_fp32(shadow, params):
        return {k: s - (1 - decay) * (s - params[k])
                for k, s in shadow.items()}

    @jax.jit
    def ema_bf16_threefry(shadow, params, rng):
        out = {}
        for k, s in shadow.items():
            new = s.astype(jnp.float32) - (1 - decay) * (
                s.astype(jnp.float32) - params[k])
            out[k] = sr_threefry(
                new, jax.random.fold_in(rng, zlib.crc32(k.encode())))
        return out

    @jax.jit
    def ema_bf16_rbg(shadow, params, rng):
        out = {}
        for k, s in shadow.items():
            fold = jax.random.fold_in(rng, zlib.crc32(k.encode()))
            key4 = jnp.concatenate(
                [jax.random.key_data(fold),
                 jax.random.key_data(jax.random.fold_in(fold, 1))]
            ).astype(jnp.uint32)
            new = s.astype(jnp.float32) - (1 - decay) * (
                s.astype(jnp.float32) - params[k])
            out[k] = sr_rbg(new, key4)
        return out

    rng = jax.random.PRNGKey(0)
    sh32 = make(jnp.float32)
    t_fp32 = bench("fp32 EMA (no SR)", ema_fp32, sh32, params)
    del sh32
    sh16 = make(jnp.bfloat16)
    t_rbg = bench("bf16 SR rng_bit_generator", ema_bf16_rbg, sh16, params, rng)
    t_tf = bench("bf16 SR threefry (current)", ema_bf16_threefry,
                 sh16, params, rng)
    print(f"\nthreefry SR overhead vs rbg: {t_tf - t_rbg:.1f} ms")
    print(f"rbg SR overhead vs fp32 EMA: {t_rbg - t_fp32:.1f} ms")


if __name__ == "__main__":
    main()
