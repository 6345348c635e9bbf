"""Sweep splash-attention backward blocks at SD1.5 UNet shapes (VERDICT #2).

Times fwd-only and fwd+bwd of the splash kernel per (bq_dkv, bkv_dkv,
bq_dq, bkv_dq) candidate, per attention shape that dominates the 512px
step. Run ONE process at a time (single-client TPU tunnel).

Usage: python lab/micro_splash_sweep.py [quick]
"""

import itertools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scal_sdt_tpu.ops.splash import splash_attention  # noqa: E402

# (B, H, L, D): level-1 self-attn at 64x64 dominates; level-2 at 32x32 next.
SHAPES = [
    (8, 8, 4096, 40),
    (8, 8, 1024, 80),
]
FWD = (1024, 1024)  # measured round-2 optimum; kept fixed here

CANDS = [512, 1024, 2048]


def time_one(shape, bwd_blocks, iters=10):
    b, h, l, d = shape
    rng = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i), (b, h, l, d),
                                 jnp.bfloat16) for i in range(3))
    scale = d ** -0.5

    def loss(q, k, v):
        o = splash_attention(q, k, v, scale, FWD[0], FWD[1],
                             bwd_blocks=bwd_blocks)
        return jnp.sum(o.astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    # warmup (compile + layout)
    for _ in range(2):
        out = g(q, k, v)
        float(np.asarray(out[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(q, k, v)
    float(np.asarray(out[0]).ravel()[0])  # host value fetch = true barrier
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    for shape in SHAPES:
        l = shape[2]
        usable = [c for c in CANDS if l % c == 0 and c <= l]
        base = time_one(shape, None)
        print(f"shape {shape}: default bwd=fwd{FWD} -> {base:.2f} ms",
              flush=True)
        if quick:
            continue

        # the dq and dkv kernels are separate programs (use_fused_bwd_kernel
        # =False), so their block pairs tune independently: sweep each pair
        # with the other held at the fwd default, then time the combination
        def t(combo):
            try:
                ms = time_one(shape, combo)
                print(f"  bwd={combo}: {ms:.2f} ms", flush=True)
                return ms
            except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
                print(f"  bwd={combo}: FAILED {type(e).__name__}", flush=True)
                return float("inf")

        dkv_best = min(itertools.product(usable, usable),
                       key=lambda p: t((p[0], p[1], FWD[0], FWD[1])))
        dq_best = min(itertools.product(usable, usable),
                      key=lambda p: t((FWD[0], FWD[1], p[0], p[1])))
        combo = (dkv_best[0], dkv_best[1], dq_best[0], dq_best[1])
        ms = t(combo)
        print(f"BEST for {shape}: {combo} at {ms:.2f} ms "
              f"({ms - base:+.2f} vs default)", flush=True)


if __name__ == "__main__":
    main()
