"""Micro: is the EMA-on regression host-DISPATCH-bound (per-leaf buffers)?

The EMA-on bench is 2.31-2.57 steps/s vs 4.11 off (+150-190 ms/step), yet
the xplane trace shows only ~45 ms/step of update-program device time and
~74 ms/step of device IDLE (plus untraced gaps). Hypothesis: the ~230-leaf
bf16 shadow doubles the update program's argument/output buffer count, and
axon-relay dispatch cost scales with buffer count (PERF_NOTES round-2: the
update's ~65 ms dispatch only *hid* behind the grad program's device time).

Variants, all donated, chained N iters with ONE host fetch at the end
(pipeline wall-clock — what the bench sees):

  a) per-leaf shadow (122 leaves)            -- current EMAState layout
  b) stacked shadow, params pre-stacked      -- dispatch floor
  c) stacked shadow, params per-leaf,
     stacked transiently inside the program  -- the realistic fix

Run: python lab/micro_ema_dispatch.py   (TPU; serialize vs other TPU work)

RESULT (v5e-1, 2026-08-19, 665M elements, threefry SR bf16 shadow):
    per-leaf shadow (132 leaves)          21.3 ms/iter
    stacked shadow (6 stacks)             19.5 ms/iter
    stacked, leaf params                  24.9 ms/iter
Hypothesis REFUTED: dispatching ~264 extra buffers costs ~2 ms, not
~150. Chained donated updates hit the traffic floor regardless of leaf
count (the earlier micro_ema_sr numbers were per-iter-fetch latency, not
throughput). The EMA-on regression must come from the full update
program's environment (memory pressure / scheduling), not buffer count.
"""

from __future__ import annotations

import time
import zlib
from collections import defaultdict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = (
    [(1280, 1280, 3, 3)] * 24
    + [(1280, 5120)] * 12
    + [(5120, 1280)] * 12
    + [(1280, 1280)] * 60
    + [(640, 640, 3, 3)] * 12
    + [(320, 320, 3, 3)] * 12
)
DECAY = 0.9999


def make(dtype):
    return {f"w{i}": jnp.ones(s, dtype) for i, s in enumerate(SHAPES)}


def families():
    fam = defaultdict(list)
    for i, s in enumerate(SHAPES):
        fam[s].append(f"w{i}")
    return fam


def sr(x, key):
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    r = jax.random.bits(key, x.shape, jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(
        ((bits + r) >> 16).astype(jnp.uint16), jnp.bfloat16)


def ema_one(s, p, key):
    new = s.astype(jnp.float32) - (1 - DECAY) * (s.astype(jnp.float32) - p)
    return sr(new, key)


@partial(jax.jit, donate_argnums=0)
def upd_perleaf(shadow, params, rng):
    return {k: ema_one(s, params[k],
                       jax.random.fold_in(rng, zlib.crc32(k.encode())))
            for k, s in shadow.items()}


@partial(jax.jit, donate_argnums=0)
def upd_stacked(shadow_stacks, param_stacks, rng):
    return {k: ema_one(s, param_stacks[k], jax.random.fold_in(rng, i))
            for i, (k, s) in enumerate(shadow_stacks.items())}


def make_upd_stacked_from_leaves(fam):
    @partial(jax.jit, donate_argnums=0)
    def upd(shadow_stacks, params, rng):
        out = {}
        for i, (shape, keys) in enumerate(sorted(fam.items(), key=str)):
            p = jnp.stack([params[k] for k in keys]).astype(jnp.bfloat16)
            sk = f"s{i}"
            out[sk] = ema_one(shadow_stacks[sk], p, jax.random.fold_in(rng, i))
        return out
    return upd


def bench(name, fn, state, *args, iters=8):
    state = fn(state, *args)
    state = fn(state, *args)
    _ = float(np.asarray(jax.tree.leaves(state)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state, *args)
    _ = float(np.asarray(jax.tree.leaves(state)[0].ravel()[0]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:36s} {dt:8.1f} ms/iter")
    return state, dt


def main():
    n = sum(int(np.prod(s)) for s in SHAPES)
    print(f"total elements: {n/1e6:.0f}M, leaves: {len(SHAPES)}, "
          f"families: {len(families())}")
    rng = jax.random.PRNGKey(0)
    fam = families()

    params = make(jnp.float32)
    shadow = make(jnp.bfloat16)
    shadow, _ = bench("per-leaf shadow", upd_perleaf, shadow, params, rng)
    del shadow

    keys_sorted = sorted(fam.items(), key=str)
    shadow_stacks = {f"s{i}": jnp.ones((len(ks),) + shape, jnp.bfloat16)
                     for i, (shape, ks) in enumerate(keys_sorted)}
    param_stacks = {f"s{i}": jnp.ones((len(ks),) + shape, jnp.float32)
                    for i, (shape, ks) in enumerate(keys_sorted)}
    shadow_stacks, _ = bench("stacked shadow", upd_stacked,
                             shadow_stacks, param_stacks, rng)
    del param_stacks

    upd_c = make_upd_stacked_from_leaves(fam)
    bench("stacked, leaf params", upd_c, shadow_stacks, params, rng)


if __name__ == "__main__":
    main()
