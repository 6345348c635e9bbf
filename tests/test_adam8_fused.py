"""Fused int8-Adam Pallas kernel vs the unfused XLA reference path.

The kernel (ops/adam8_fused.py) must reproduce quantized.py's math exactly:
same dequant, same Adam update, same absmax requantization over zero-padded
256-blocks (incl. ragged minors, where the kernel masks instead of padding).
Run in interpreter mode on CPU; the TPU-compiled variant shares the
identical kernel body.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from scal_sdt_tpu.ops.adam8_fused import BLOCK, adam8_fused_update
from scal_sdt_tpu.training.quantized import (
    _dequantize_leaf, _from_blocks, _leaf_view, _quantize_leaf, _to_blocks)

B1, B2, EPS = 0.9, 0.999, 1e-8


def _xla_reference(g, mu_q3, mu_s3, nu_q3, nu_s3, inv_bc1, inv_bc2):
    """The unfused quantized.py leaf math on (lead, nb, BLOCK) state."""
    g3 = _to_blocks(g).astype(jnp.float32)
    mu = _dequantize_leaf(mu_q3, mu_s3)
    nu = _dequantize_leaf(nu_q3, nu_s3)
    mu = B1 * mu + (1.0 - B1) * g3
    nu = B2 * nu + (1.0 - B2) * jnp.square(g3)
    out = (mu * inv_bc1) / (jnp.sqrt(nu * inv_bc2) + EPS)
    mq, ms = _quantize_leaf(mu)
    nq, ns = _quantize_leaf(nu)
    return _from_blocks(out, g.shape), mq, ms, nq, ns


def _run_both(shape, seed):
    rng = np.random.RandomState(seed)
    lead, minor, nb = _leaf_view(shape)
    g = jnp.asarray(rng.randn(*shape).astype(np.float32))
    mu0 = _to_blocks(jnp.asarray(0.1 * rng.randn(*shape).astype(np.float32)))
    nu0 = _to_blocks(jnp.asarray(
        0.01 * np.abs(rng.randn(*shape)).astype(np.float32)))
    mu_q3, mu_s3 = _quantize_leaf(mu0)
    nu_q3, nu_s3 = _quantize_leaf(nu0)

    t = 7.0
    inv_bc1 = jnp.float32(1.0 / (1.0 - B1 ** t))
    inv_bc2 = jnp.float32(1.0 / (1.0 - B2 ** t))

    want = _xla_reference(g, mu_q3, mu_s3, nu_q3, nu_s3, inv_bc1, inv_bc2)
    out2, mq, ms, nq, ns = adam8_fused_update(
        g.reshape(lead, minor),
        mu_q3.reshape(lead, nb * BLOCK), mu_s3.reshape(lead, nb),
        nu_q3.reshape(lead, nb * BLOCK), nu_s3.reshape(lead, nb),
        inv_bc1, inv_bc2, b1=B1, b2=B2, eps=EPS, interpret=True)
    got = (out2.reshape(shape), mq.reshape(lead, nb, BLOCK),
           ms.reshape(lead, nb, 1), nq.reshape(lead, nb, BLOCK),
           ns.reshape(lead, nb, 1))
    return want, got


@pytest.mark.parametrize("shape", [
    (64, 256),          # exact blocks
    (64, 300),          # ragged minor (in-kernel mask path)
    (40, 48, 3, 3),     # conv-like leaf, ragged (432-wide minor)
    (70, 1024),         # ragged lead (sublane padding)
])
def test_fused_matches_xla_path(shape):
    want, got = _run_both(shape, seed=sum(shape))
    names = ("out", "mu_q", "mu_s", "nu_q", "nu_s")
    for name, w, g in zip(names, want, got):
        w, g = np.asarray(w), np.asarray(g)
        if w.dtype == np.int8:
            # round() at exact .5 boundaries may differ by 1 ulp of int8
            assert np.abs(w.astype(np.int32) - g.astype(np.int32)).max() <= 1, name
            assert (w != g).mean() < 1e-3, name
        else:
            np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-7,
                                       err_msg=f"{name} {shape}")


def test_zero_state_first_step():
    """First step from zero-initialized moments (scales 0 -> safe path)."""
    shape = (32, BLOCK)
    g = jnp.asarray(np.linspace(-1, 1, 32 * BLOCK, dtype=np.float32)
                    .reshape(shape))
    z_q = jnp.zeros((32, BLOCK), jnp.int8)
    z_s = jnp.zeros((32, 1), jnp.float32)
    inv_bc1 = jnp.float32(1.0 / (1.0 - B1))
    inv_bc2 = jnp.float32(1.0 / (1.0 - B2))
    out, mq, ms, nq, ns = adam8_fused_update(
        g, z_q, z_s, z_q, z_s, inv_bc1, inv_bc2,
        b1=B1, b2=B2, eps=EPS, interpret=True)
    want, *_ = _xla_reference(
        g, z_q.reshape(32, 1, BLOCK), z_s.reshape(32, 1, 1),
        z_q.reshape(32, 1, BLOCK), z_s.reshape(32, 1, 1), inv_bc1, inv_bc2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6, atol=1e-7)
    assert np.isfinite(np.asarray(out)).all()
