"""bf16-moment Adam update: XLA chain vs fused pallas kernel (TPU micro).

Usage: python lab/micro_bf16_update.py [xla|fused]
Times one full-SD1.5-UNet update (all leaves, unpacked) for the selected
implementation. Production adds slab packing on top; this isolates the
per-leaf moment-math cost that the fused kernel targets.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scal_sdt_tpu.models.unet import UNetConfig, unet_param_shapes
# Fused-kernel candidate (REFUTED on TPU: 42.7 ms vs 18.1 ms XLA — the
# ~80 us/custom-call launch tax x 686 leaves dominates; XLA already
# fuses the bf16 cast+Adam chain near the traffic floor. Kept here as
# the experiment record; see PERF_NOTES.md.)
from functools import partial as _partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


COL_BLOCK = 512
_DEFAULT_ROWS = 512


def padded_minor(minor: int) -> int:
    """Column-padded moment width for a (lead, minor) leaf view."""
    return -(-minor // COL_BLOCK) * COL_BLOCK


def _kernel(scalars_ref, g_ref, mu_ref, nu_ref,
            out_ref, mu_o_ref, nu_o_ref,
            *, b1: float, b2: float, eps: float, minor: int):
    inv_bc1 = scalars_ref[0]  # 1 / (1 - b1**t)
    inv_bc2 = scalars_ref[1]
    g = g_ref[:].astype(jnp.float32)
    if minor % COL_BLOCK:
        # ragged final block: the gradient block reads past the array edge;
        # zero those columns so the stored (padded) moments stay exactly zero
        j = pl.program_id(1)
        cols = j * COL_BLOCK + jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        g = jnp.where(cols < minor, g, 0.0)
    mu = b1 * mu_ref[:].astype(jnp.float32) + (1.0 - b1) * g
    nu = b2 * nu_ref[:].astype(jnp.float32) + (1.0 - b2) * (g * g)
    out_ref[:] = ((mu * inv_bc1) / (jnp.sqrt(nu * inv_bc2) + eps)).astype(
        out_ref.dtype)
    mu_o_ref[:] = mu.astype(mu_o_ref.dtype)
    nu_o_ref[:] = nu.astype(nu_o_ref.dtype)


@_partial(jax.jit, static_argnames=("b1", "b2", "eps", "block_rows",
                                             "interpret"))
def adam_bf16_fused_update(g2: jnp.ndarray, mu: jnp.ndarray, nu: jnp.ndarray,
                           inv_bc1: jnp.ndarray, inv_bc2: jnp.ndarray,
                           *, b1: float, b2: float, eps: float,
                           block_rows: int = _DEFAULT_ROWS,
                           interpret: bool = False):
    """One fused Adam step over a leaf's (lead, minor) 2-D view.

    g2: (lead, minor) gradient, UNPADDED (any float dtype; math in fp32).
    mu/nu: (lead, padded_minor(minor)) moments in their storage dtype
    (bf16 in production; any float works). Returns (out, mu', nu') with
    out (lead, minor) in g2's dtype and moments padded as stored.
    """
    lead, minor = g2.shape
    padded = padded_minor(minor)
    assert mu.shape == (lead, padded), (g2.shape, mu.shape)
    # bf16 tiles want 16-sublane alignment; fp32 wants 8 — use 16.
    br = min(block_rows, -(-lead // 16) * 16)
    grid = (pl.cdiv(lead, br), padded // COL_BLOCK)

    spec = pl.BlockSpec((br, COL_BLOCK), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    scalars = jnp.stack([inv_bc1.astype(jnp.float32),
                         inv_bc2.astype(jnp.float32)])
    kernel = _partial(_kernel, b1=b1, b2=b2, eps=eps, minor=minor)
    out, mu_o, nu_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((lead, minor), g2.dtype),
            jax.ShapeDtypeStruct((lead, padded), mu.dtype),
            jax.ShapeDtypeStruct((lead, padded), nu.dtype),
        ],
        interpret=interpret,
    )(scalars, g2, mu, nu)
    return out, mu_o, nu_o


B1, B2, EPS = 0.9, 0.999, 1e-8
MODE = sys.argv[1] if len(sys.argv) > 1 else "fused"

shapes = unet_param_shapes(UNetConfig.sd15())
rng = np.random.RandomState(0)
grads = {k: jnp.asarray(rng.randn(*s).astype(np.float32) * 1e-3, jnp.bfloat16)
         for k, s in shapes.items()}


def leaf_view(shape):
    if len(shape) >= 2:
        return int(shape[0]), int(np.prod(shape[1:]))
    return 1, int(np.prod(shape)) if shape else 1


if MODE == "xla":
    mu = {k: jnp.zeros(s, jnp.bfloat16) for k, s in shapes.items()}
    nu = {k: jnp.zeros(s, jnp.bfloat16) for k, s in shapes.items()}

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def upd(grads, mu, nu, count):
        c = count.astype(jnp.float32)
        bc1 = 1.0 - B1 ** c
        bc2 = 1.0 - B2 ** c
        out, mu2, nu2 = {}, {}, {}
        for k, g in grads.items():
            g32 = g.astype(jnp.float32)
            m = B1 * mu[k].astype(jnp.float32) + (1 - B1) * g32
            n = B2 * nu[k].astype(jnp.float32) + (1 - B2) * jnp.square(g32)
            out[k] = ((m / bc1) / (jnp.sqrt(n / bc2) + EPS)).astype(g.dtype)
            mu2[k] = m.astype(jnp.bfloat16)
            nu2[k] = n.astype(jnp.bfloat16)
        return out, mu2, nu2
else:
    mu = {k: jnp.zeros((leaf_view(s)[0], padded_minor(leaf_view(s)[1])),
                       jnp.bfloat16) for k, s in shapes.items()}
    nu = {k: jnp.zeros_like(v) for k, v in mu.items()}

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def upd(grads, mu, nu, count):
        c = count.astype(jnp.float32)
        inv1 = 1.0 / (1.0 - B1 ** c)
        inv2 = 1.0 / (1.0 - B2 ** c)
        out, mu2, nu2 = {}, {}, {}
        for k, g in grads.items():
            lead, minor = leaf_view(g.shape)
            o, m, n = adam_bf16_fused_update(
                g.reshape(lead, minor), mu[k], nu[k], inv1, inv2,
                b1=B1, b2=B2, eps=EPS)
            out[k] = o.reshape(g.shape)
            mu2[k], nu2[k] = m, n
        return out, mu2, nu2

count = jnp.asarray(1, jnp.int32)
for _ in range(3):
    out, mu, nu = upd(grads, mu, nu, count)
    float(np.asarray(out["conv_in.weight"]).ravel()[0])
t0 = time.perf_counter()
N = 20
for _ in range(N):
    out, mu, nu = upd(grads, mu, nu, count)
float(np.asarray(out["conv_in.weight"]).ravel()[0])
print(f"bf16 update [{MODE}]: {(time.perf_counter() - t0) / N * 1e3:.1f} ms")
