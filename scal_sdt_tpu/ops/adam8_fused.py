"""Fused int8-Adam update kernel: dequant -> Adam -> requant in ONE pass.

The TPU analogue of bitsandbytes' fused AdamW8bit CUDA kernel (the
reference's recommended optimizer, ``/root/reference/configs/README.md:59``).
The unfused XLA path in ``training/quantized.py`` materializes the fp32
moments in HBM between the dequantize, update, and requantize stages —
3 extra fp32 round-trips per moment. This kernel keeps the whole update in
VMEM per (rows, 256) tile.

LAYOUT IS THE WHOLE GAME — three measured pathologies shape this design:

1. Boundary reshapes must be trailing-dim merges of the natural leaf shape
   ((O,I,3,3) -> (O, I*9)), which the TPU layout engine does at copy speed.
   Flattening blocks to (lead*nb, 256) rows merges LEADING dims, which XLA
   linearizes element-wise at the custom-call boundary (~90 ms per
   14.7M-element leaf — the round-2 flat-1D pathology all over again).
   The gradient is passed UNPADDED (lead, minor); the ragged final
   256-block is masked inside the kernel.

2. The per-256-block absmax scales form NARROW (lead, nb) arrays. Streaming
   them as (block_rows, nb) grid blocks degrades the DMA to per-row 4*nb-byte
   descriptors (measured: a (1.66M, 256) call spent 21 s — ~1000 tiny DMAs
   per grid step).

3. Keeping a whole (lead, nb) slab VMEM-resident doesn't work either: VMEM
   tiles pad the lane dim to 128, so a (10240, 5) slab inflates to 5.2 MB
   and blows the 16 MB scoped-vmem budget at 4 slabs.

Resolution: scales are lane-padded to a fixed 128-wide panel in HBM (a
KB-scale jnp.pad, fused by XLA), then streamed as dense (block_rows, 128)
blocks — wide row bursts, 128-lane aligned, one load per row-block
(revisited across the fast j axis). Column j is selected/merged with an
iota mask; no transposes, no dynamic lane slicing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256
SCALE_PANEL = 128      # lane-padded width of the scale panel
_DEFAULT_ROWS = 256    # (256, 256) f32 tiles: ~1 MB resident, VPU/HBM-bound


def _kernel(scalars_ref, g_ref, mu_q_ref, mu_s_ref, nu_q_ref, nu_s_ref,
            out_ref, mu_q_o_ref, mu_s_o_ref, nu_q_o_ref, nu_s_o_ref,
            *, b1: float, b2: float, eps: float, minor: int):
    inv_bc1 = scalars_ref[0]  # 1 / (1 - b1**t)
    inv_bc2 = scalars_ref[1]
    j = pl.program_id(1)
    col_is_j = jax.lax.broadcasted_iota(
        jnp.int32, (1, SCALE_PANEL), 1) == j

    def read_col(s_ref):
        return jnp.sum(jnp.where(col_is_j, s_ref[:], 0.0), axis=1,
                       keepdims=True)

    g = g_ref[:].astype(jnp.float32)
    if minor % BLOCK:
        # ragged final block: zero the out-of-range gradient columns so the
        # absmax scales (and the stored moments) see exact zeros, matching
        # the zero-padded XLA path bit for bit
        cols = j * BLOCK + jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        g = jnp.where(cols < minor, g, 0.0)

    mu = mu_q_ref[:].astype(jnp.float32) * read_col(mu_s_ref)
    nu = nu_q_ref[:].astype(jnp.float32) * read_col(nu_s_ref)
    mu = b1 * mu + (1.0 - b1) * g
    nu = b2 * nu + (1.0 - b2) * (g * g)

    out = (mu * inv_bc1) / (jnp.sqrt(nu * inv_bc2) + eps)
    out_ref[:] = out.astype(out_ref.dtype)

    for val, q_ref, s_ref in ((mu, mu_q_o_ref, mu_s_o_ref),
                              (nu, nu_q_o_ref, nu_s_o_ref)):
        scale = jnp.max(jnp.abs(val), axis=1, keepdims=True) / 127.0
        safe = jnp.where(scale > 0, scale, 1.0)
        q_ref[:] = jnp.clip(jnp.round(val / safe), -127, 127).astype(jnp.int8)
        # merge-write column j; the panel block is revisited across j (the
        # fastest grid dim) and flushed to HBM once per row-block, after
        # every column has been written exactly once
        s_ref[:] = jnp.where(col_is_j, scale, s_ref[:])


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps", "block_rows",
                                             "interpret"))
def adam8_fused_update(g2: jnp.ndarray, mu_q: jnp.ndarray, mu_s: jnp.ndarray,
                       nu_q: jnp.ndarray, nu_s: jnp.ndarray,
                       inv_bc1: jnp.ndarray, inv_bc2: jnp.ndarray,
                       *, b1: float, b2: float, eps: float,
                       block_rows: int = _DEFAULT_ROWS,
                       interpret: bool = False):
    """One fused Adam step over a leaf's 2-D view.

    g2: (lead, minor) gradient (fp32 or bf16 — cast to fp32 in VMEM; the
    update comes back in g2's dtype) — the leaf with trailing dims merged,
    NOT padded; mu_q/nu_q: (lead, nb*256) int8 payloads; mu_s/nu_s:
    (lead, nb) fp32 absmax scales, nb = ceil(minor/256) <= 128;
    inv_bc1/inv_bc2: () fp32 bias corrections.
    Returns (out, mu_q', mu_s', nu_q', nu_s') with the same shapes.
    """
    lead, minor = g2.shape
    nb = mu_s.shape[1]
    assert mu_q.shape == (lead, nb * BLOCK), (g2.shape, mu_q.shape)
    assert nb <= SCALE_PANEL, f"nb={nb} exceeds the scale panel width"
    # int8 tiles need 32-sublane alignment; the final partial block is padded
    br = min(block_rows, -(-lead // 32) * 32)
    grid = (pl.cdiv(lead, br), nb)

    spad = ((0, 0), (0, SCALE_PANEL - nb))
    mu_s_p = jnp.pad(mu_s, spad)
    nu_s_p = jnp.pad(nu_s, spad)

    wide = lambda i, j: (i, j)
    data_spec = pl.BlockSpec((br, BLOCK), wide, memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((br, SCALE_PANEL), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
    scalars = jnp.stack([inv_bc1.astype(jnp.float32),
                         inv_bc2.astype(jnp.float32)])

    kernel = functools.partial(_kernel, b1=b1, b2=b2, eps=eps, minor=minor)
    out, mq, ms, nq, ns = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (2,) scalars, whole
            data_spec, data_spec, scale_spec, data_spec, scale_spec,
        ],
        out_specs=[data_spec, data_spec, scale_spec, data_spec, scale_spec],
        out_shape=[
            jax.ShapeDtypeStruct((lead, minor), g2.dtype),
            jax.ShapeDtypeStruct((lead, nb * BLOCK), jnp.int8),
            jax.ShapeDtypeStruct((lead, SCALE_PANEL), jnp.float32),
            jax.ShapeDtypeStruct((lead, nb * BLOCK), jnp.int8),
            jax.ShapeDtypeStruct((lead, SCALE_PANEL), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, g2, mu_q, mu_s_p, nu_q, nu_s_p)
    return out, mq, ms[:, :nb], nq, ns[:, :nb]
