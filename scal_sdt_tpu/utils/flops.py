"""Analytic FLOP counting for MFU reporting (VERDICT r3 item 6).

Counts matmul/conv FLOPs of an arbitrary function by abstract-tracing it
(``jax.make_jaxpr`` — no device, no compile) and walking the jaxpr:
``dot_general`` contributes ``2·batch·M·N·K``, ``conv_general_dilated``
``2·|out|·k_h·k_w·C_in/groups``. This is the standard "model FLOPs"
convention (elementwise/softmax/norm ops excluded), the numerator of MFU.

The torch reference publishes no FLOP or MFU numbers at all (BASELINE.md);
this turns our steps/sec into a judgeable efficiency claim:
``MFU = model_flops_per_step · steps_per_sec / peak_flops``.

For a train step, use ``3 × forward`` (backward ≈ 2× forward in matmul
FLOPs) — remat recompute is deliberately NOT counted, per convention.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np

__all__ = ["count_matmul_conv_flops", "train_step_flops", "TPU_PEAK_FLOPS"]

# bf16 peak matmul FLOP/s per chip (marketing peak; MFU denominators).
TPU_PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def _dot_general_flops(eqn) -> float:
    (lhs, rhs) = eqn.invars[:2]
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    ls, rs = lhs.aval.shape, rhs.aval.shape
    batch = math.prod(ls[d] for d in lb) if lb else 1
    k = math.prod(ls[d] for d in lc) if lc else 1
    m = math.prod(d for i, d in enumerate(ls) if i not in lc and i not in lb)
    n = math.prod(d for i, d in enumerate(rs) if i not in rc and i not in rb)
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    rhs = eqn.invars[1]
    out = eqn.outvars[0]
    dn = eqn.params["dimension_numbers"]
    kshape = rhs.aval.shape
    spatial = math.prod(kshape[d] for d in dn.rhs_spec[2:])
    # rhs_spec[1] is C_in/groups already, so grouping needs no extra factor
    cin_per_group = kshape[dn.rhs_spec[1]]
    return 2.0 * math.prod(out.aval.shape) * spatial * cin_per_group


def _count_jaxpr(jaxpr, scale: float = 1.0) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += scale * _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += scale * _conv_flops(eqn)
        elif name == "scan":
            length = eqn.params.get("length", 1)
            total += _count_jaxpr(eqn.params["jaxpr"].jaxpr, scale * length)
        elif name == "while":
            # trip count unknowable statically; count one body iteration
            total += _count_jaxpr(eqn.params["body_jaxpr"].jaxpr, scale)
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max(_count_jaxpr(b.jaxpr, scale) for b in branches)
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    inner = getattr(sub, "jaxpr", sub)
                    total += _count_jaxpr(inner, scale)
                    break
    return total


def count_matmul_conv_flops(fn, *args, **kwargs) -> float:
    """Matmul+conv FLOPs of one call of ``fn(*args)``, by abstract trace.

    Args may be concrete arrays or ``jax.ShapeDtypeStruct``s. Attention must
    take the plain-XLA path during the trace (Pallas custom calls hide their
    dots): wrap the call with ``ops.attention.FORCE_XLA = True``.
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _count_jaxpr(closed.jaxpr)


def train_step_flops(unet_config, batch: int, latent_hw: int,
                     context_len: int = 77) -> float:
    """Model FLOPs of one full-fine-tune train step (3× UNet forward) at the
    given batch and square latent size. Traced with XLA attention so the
    attention dots are visible; elementwise/softmax excluded by convention."""
    import jax.numpy as jnp

    from ..models.unet import init_unet_params, unet_apply
    from ..ops import attention as attention_ops

    shapes = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype)
        for k, v in jax.eval_shape(
            lambda r: init_unet_params(r, unet_config),
            jax.random.PRNGKey(0)).items()
    }
    # dtype does not change the FLOP count; match the fp32 param templates
    x = jax.ShapeDtypeStruct((batch, latent_hw, latent_hw, 4), jnp.float32)
    t = jax.ShapeDtypeStruct((batch,), jnp.float32)
    ctx = jax.ShapeDtypeStruct(
        (batch, context_len, unet_config.cross_attention_dim), jnp.float32)

    prev = attention_ops.FORCE_XLA
    attention_ops.FORCE_XLA = True
    try:
        fwd = count_matmul_conv_flops(
            lambda p, x, t, c: unet_apply(p, x, t, c, unet_config),
            shapes, x, t, ctx)
    finally:
        attention_ops.FORCE_XLA = prev
    return 3.0 * fwd
